#!/usr/bin/env python3
"""Residue-slice a testdata dir for at-scale oracle checks.

Writes a twin of `srcDir` whose `documents` table is restricted to the
first `nRes` doc_id%200 residue classes under the repo's mix64 sampling
order (the same family CanonicalSliceDump uses); every other table is
copied verbatim. Any catalog query that is a deterministic function of
the corpus then admits EXACT engine-vs-oracle parity on the slice with
the UNMODIFIED Verify + check.py — no per-query tooling:

  python3 tools/slice_corpus.py /tmp/sf100x /tmp/sf100x_slice 10
  SPARK_GRAFT_ONLY=q186_curation_funnel,... \
    sbt -batch "runMain graft.Verify /tmp/sf100x_slice /tmp/v100_slice"
  python3 tools/check.py /tmp/sf100x_slice /tmp/v100_slice q186_curation_funnel,...

(r17: q165/q171/q180/q183/q186 all PASS on the 10-residue slice of the
100x corpus — 25,000 docs, total oracle replay 77.8 s; SCALE.md
"Twin-path equivalence"/"residue-slice" section.)

Note the boundary: the slice is only valid for queries whose oracle
reads `documents` alone (corpus-global state like dedup groups, LM
training, terciles is re-derived BY the oracle from the same restricted
corpus, so parity is exact). A query joining documents against another
table by id would see a consistent but thinner join — still exact
parity, since both engines read the same slice dir.

Second boundary, found the hard way (r17): slicing bounds the CORPUS,
not the ORACLE'S plan — q178's full-six-iteration gdTrainer CTE chain
OOMs DuckDB even at 80GB on a 25k-doc slice (the macro-expanded
iteration chain, not the data, is the cost). For that class use the
per-iteration decomposition instead (graft.TrainerDump +
tools/q178_scale_check.py — each update independently replayed with
the engine's w_t injected; PASS at the full 100x corpus, 500k scores
exact).
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

MASK = (1 << 64) - 1


def mix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def main() -> None:
    if len(sys.argv) < 3:
        print("usage: slice_corpus.py <srcDir> <dstDir> [nRes=10]",
              file=sys.stderr)
        sys.exit(2)
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2])
    n_res = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # (r + 0xB7) matches CanonicalSliceDump.residues / q189_scale_check
    # exactly (r18 advisor fix: the offset was missing, so this tool
    # sampled a DIFFERENT mix64-ranked set than the one it claimed to
    # share — parity on the slice was still exact since both engines
    # read the same slice dir, but cross-tool residue comparisons would
    # have silently mismatched; r17 slice artifacts used the old set)
    residues = set(sorted(range(200), key=lambda r: mix64(r + 0xB7))[:n_res])
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        if f.name == "documents.parquet":
            continue
        if f.is_dir():
            shutil.copytree(f, dst / f.name, dirs_exist_ok=True)
        else:
            shutil.copyfile(f, dst / f.name)
    t = pq.read_table(src / "documents.parquet")
    ids = t.column("doc_id").to_pylist()
    mask = pa.array([(i % 200) in residues for i in ids])
    out = t.filter(mask)
    pq.write_table(out, dst / "documents.parquet")
    print(f"[slice_corpus] {t.num_rows} -> {out.num_rows} docs at {dst}; "
          f"residues {sorted(residues)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Fabricate a NON-ASCII twin of a testdata dir (r16 verdict item #2).

The driver corpora are printable-ASCII, so the r17 whitespace-contract
unification (Kernels.isRegexWs = DuckDB RE2 `\\s`, i.e. [ \\t\\n\\f\\r])
is exercised there only by unit fixtures. This tool plants, into a
deterministic fraction of `documents.text`, exactly the characters
where the OLD tokenizers (Character.isWhitespace / Java `\\s`) disagree
with the engine class:

  U+000B  vertical tab        Java-\\s + isWhitespace, NOT RE2 \\s
  U+001C  file separator      isWhitespace, NOT \\s in either regex
  U+2028  line separator      isWhitespace, NOT \\s in either regex
  U+3000  ideographic space   isWhitespace, NOT \\s in either regex

plus case-stable non-ASCII letters (lowercase ß σ é ı — pinned: DuckDB
lower() and JVM toLowerCase(Locale.ROOT) agree on these; uppercase
U+0130 and word-final U+03A3 deliberately EXCLUDED, they are the
documented DuckDB simple-vs-JVM-full case-mapping boundary, see
FunctionsSpec "r17 case-folding parity" and SCALE.md).

Everything is a pure function of doc_id — no RNG, byte-stable across
runs. The `n_chars = len(text)` invariant of the source corpus is
preserved (recomputed after planting). All other tables are copied
verbatim.

Usage: python3 tools/unicode_corpus.py [srcDir] [dstDir] [case]
       (defaults: /root/testdata/sf0.01 -> /tmp/sfni)

Then replay the full catalog on it:
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /tmp/sfni /tmp/verify_out_ni"
  CHECK_JSON=CORRECTNESS_unicode_r17.json python3 tools/check.py /tmp/sfni /tmp/verify_out_ni

The optional third arg `case` ADDITIONALLY plants the two case-mapping-
boundary characters (U+0130 İ and word-final U+03A3 Σ — where DuckDB's
simple lowercase map diverges from the JVM's full mapping) into ~1/5 of
docs. A case twin supports replaying ONLY the oracle that folds the
mapping in (q79_heavy_hitters, r18 — see its scaladoc):
  SPARK_GRAFT_ONLY=q79_heavy_hitters sbt -batch "runMain graft.Verify /tmp/sfcase /tmp/v_case"
  python3 tools/check.py /tmp/sfcase /tmp/v_case q79_heavy_hitters
Every OTHER text oracle diverges on such a corpus by the documented
boundary — that is exactly why the default mode excludes İ/Σ.
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

VT = chr(0x000B)
FS = chr(0x001C)
LS = chr(0x2028)
IS = chr(0x3000)
GLUERS = [VT, FS, LS, IS]
# lowercase-stable in BOTH engines (lower() is identity); BMP only
WORDS = ["straße", "σigma", "café", "ırmak"]


def replace_nth_space(text: str, n: int, repl: str) -> str:
    """Replace the n-th (1-based) space of `text` with `repl`; no-op if
    the text has fewer spaces."""
    seen = 0
    for i, ch in enumerate(text):
        if ch == " ":
            seen += 1
            if seen == n:
                return text[:i] + repl + text[i + 1 :]
    return text


def plant_case_boundary(doc_id: int, text: str) -> str:
    """`case` mode: İ (full-lower = i + U+0307, simple = i) and ΟΔΥΣΣΕΥΣ
    (medial ΣΣ → σσ in both engines, word-final Σ → ς only under the
    JVM's full mapping). Planted in EVERY doc at multiplicity 2 so both
    tokens DOMINATE q79's corpus-wide top-10 — the check is then
    discriminating: without the oracle's pre-fold, DuckDB's top terms
    read 'istanbul'/'οδυσσευσ' against Spark's 'i̇stanbul'/'οδυσσευς'
    and the hash breaks (verified r18). Pure function of doc_id."""
    return f"{text} İstanbul ΟΔΥΣΣΕΥΣ İstanbul ΟΔΥΣΣΕΥΣ"


def plant(doc_id: int, text: str) -> str:
    # ~2/3 of docs get a mid-text glue: two ASCII tokens fuse into one
    # token containing a char isWhitespace would (wrongly) split at
    if doc_id % 3 != 2:
        g = GLUERS[doc_id % len(GLUERS)]
        text = replace_nth_space(text, 3 + doc_id % 7, g)
    # ~1/2 get a second glue at a different offset with a different char
    if doc_id % 2 == 0:
        g = GLUERS[(doc_id // 2) % len(GLUERS)]
        text = replace_nth_space(text, 11 + doc_id % 5, g)
    # ~1/3 get non-ASCII letter tokens appended, one of them VT-glued
    if doc_id % 3 == 0:
        w = WORDS[doc_id % len(WORDS)]
        w2 = WORDS[(doc_id // 3) % len(WORDS)]
        text = f"{text} {w} {w2}{VT}tail"
    # ~1/7 get a leading FS-glued pair (leading-token edge)
    if doc_id % 7 == 0:
        text = f"fs{FS}lead {text}"
    return text


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfni")
    case_mode = len(sys.argv) > 3 and sys.argv[3] == "case"
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.parquet")):
        if f.name != "documents.parquet":
            shutil.copyfile(f, dst / f.name)
    t = pq.read_table(src / "documents.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    planted = [plant(i, s) for i, s in zip(cols["doc_id"], cols["text"])]
    if case_mode:
        planted = [plant_case_boundary(i, s)
                   for i, s in zip(cols["doc_id"], planted)]
    changed = sum(a != b for a, b in zip(planted, cols["text"]))
    cols["text"] = planted
    cols["n_chars"] = [len(s) for s in planted]  # preserve the invariant
    out = pa.table({n: pa.array(cols[n], type=t.schema.field(n).type)
                    for n in t.column_names})
    pq.write_table(out, dst / "documents.parquet")
    nonascii = sum(any(ord(c) > 126 or ord(c) == 0x0B or ord(c) == 0x1C for c in s)
                   for s in planted)
    print(f"[unicode_corpus] {t.num_rows} docs -> {dst}: "
          f"{changed} planted, {nonascii} now contain contract-relevant chars")


if __name__ == "__main__":
    main()

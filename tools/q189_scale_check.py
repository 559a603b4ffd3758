# Group-slice oracle check for q189 (canonical-collapse image dedup)
# at scales where the full-corpus DuckDB replay is unaffordable (the
# 10x full replay costs ~30 min; 100x would be hours of recursive
# closure over 2,500-member stars).
#
# Mechanism: q189's output depends on whole COMPONENTS (bucket arg-min
# anchors + min-label closure), so the id-level slices of
# sampled_check.py would desync labels. Instead graft.CanonicalSliceDump
# restricts the ENGINE to n mix64-sampled residue classes of the
# image-group key (doc_id mod 200) and this script replays the
# UNMODIFIED q189 oracle over the identically restricted corpus —
# exact engine-vs-oracle parity on an input that preserves the
# giant-duplicate-group regime (each residue class holds factor x 5
# near-copies at /tmp/sf10x).
#
# Usage:
#   sbt -batch "runMain graft.CanonicalSliceDump /tmp/sf10x /tmp/q189_100x 4 image"
#   python3 tools/q189_scale_check.py /tmp/sf10x /tmp/q189_100x <oracle_sql.json> [q189_image_canonical]
# where <oracle_sql.json> is any Verify dump containing the target oracle
# string; the optional 4th arg picks the query (q189_image_canonical
# default, or q197_audio_canonical with a matching "audio"-mode dump —
# the canonical machinery and this harness are both modality-generic).
import sys, os, json, glob
import duckdb

MASK = (1 << 64) - 1


def mix64(x):
    z = (x + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def main():
    sf, out, oracle_path = sys.argv[1], sys.argv[2], sys.argv[3]
    res = json.load(open(os.path.join(out, "residues.json")))
    # re-derive the residues independently and cross-check the dump
    expect = sorted(range(200), key=lambda r: mix64((r + 0xB7) & MASK))[:len(res)]
    assert sorted(res) == sorted(expect), \
        f"residue derivation desync: dump {sorted(res)} vs {sorted(expect)}"
    qname = sys.argv[4] if len(sys.argv) > 4 else "q189_image_canonical"
    sql = json.load(open(oracle_path))[qname]

    con = duckdb.connect()
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"SET threads TO {int(os.environ['CHECK_THREADS'])}")
    con.execute(f"SET memory_limit='{os.environ.get('CHECK_MEM', '48GB')}'")
    p = f"{sf}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    in_list = ",".join(str(r) for r in sorted(res))
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({src}) "
                f"WHERE doc_id % 200 IN ({in_list})")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    odf = con.execute(sql).df()
    d = "slice" if os.path.isdir(os.path.join(out, "slice")) else "q189_slice"
    sp = glob.glob(os.path.join(out, d, "*.parquet"))
    sdf = con.execute(f"SELECT * FROM read_parquet({sp!r})").df()

    sdf = sdf.reindex(sorted(sdf.columns), axis=1) \
             .sort_values(by=sorted(sdf.columns), ignore_index=True)
    odf = odf.reindex(sorted(odf.columns), axis=1) \
             .sort_values(by=sorted(odf.columns), ignore_index=True)
    ok = list(sdf.columns) == list(odf.columns) and len(sdf) == len(odf) \
        and all((sdf[c] == odf[c]).all() for c in sdf.columns)
    # component-size stat only applies to the canonical modes; the
    # payload modes (vad/scenecut/keyframes) have per-row outputs
    extra = (f" largest component {int(sdf['n_members'].max())},"
             if "n_members" in sdf.columns and len(sdf) else "")
    print(("PASS" if ok else "FAIL") +
          f" {qname}  [slice: {len(res)} residues, {n_docs} docs,"
          f"{extra} {len(sdf)} output rows]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

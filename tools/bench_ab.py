# Interleaved A/B of flagged bench movers against a prior round's
# compiled binary (r19 verdict #6): single sf0.1 captures cannot rank
# rounds — the r19 driver and builder captures disagreed in SIGN on the
# same code. The only trustworthy per-query signal is alternating the
# OLD and NEW binaries in one session window, which this tool runs
# end-to-end:
#
#   python3 tools/bench_ab.py <old-commit> <q1,q2,...> [reps]
#
#  1. git worktree of <old-commit> at /tmp/graft_ab_<short> (cached
#     across invocations), compiled there with sbt;
#  2. `reps` (default 3) alternating old/new graft.Bench invocations,
#     each restricted to the flagged queries (SPARK_GRAFT_ONLY,
#     SPARK_GRAFT_RUNS=2, -Xmx8g, local[32] — the committed capture
#     protocol), canaries recorded per invocation;
#  3. a per-query table of old/new times with medians and a verdict.
#
# Output goes to stdout; tools/close_round.py redirects it into
# ab/bench_flags_ab_r{N}.txt so the artifact exists every round without
# a manual step.
import json, os, statistics, subprocess, sys, tempfile

SPARK_CP = "/opt/spark/jars/*"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)

def ensure_old_build(commit):
    short = run(["git", "rev-parse", "--short", commit]).stdout.strip()
    if not short:
        sys.exit(f"bench_ab: cannot resolve commit {commit}")
    wt = f"/tmp/graft_ab_{short}"
    classes = os.path.join(wt, "target/scala-2.13/classes")
    if not os.path.isdir(os.path.join(classes, "graft")):
        if not os.path.isdir(wt):
            r = run(["git", "worktree", "add", "--detach", wt, commit])
            if r.returncode != 0:
                sys.exit(f"bench_ab: worktree add failed: {r.stderr[-500:]}")
        r = run(["sbt", "-batch", "compile"], cwd=wt)
        if not os.path.isdir(os.path.join(classes, "graft")):
            sys.exit(f"bench_ab: old-binary compile failed: {r.stdout[-800:]}")
    return short, classes

def bench_once(classes, queries, tag):
    out = tempfile.mktemp(prefix=f"bench_ab_{tag}_", suffix=".json")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=",".join(queries), SPARK_GRAFT_RUNS="2",
               SPARK_GRAFT_BENCH_OUT=out)
    r = run(["java", "-Xmx8g", "--add-opens=java.base/java.nio=ALL-UNNAMED",
             "--add-opens=java.base/java.lang=ALL-UNNAMED",
             "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
             "--add-opens=java.base/java.util=ALL-UNNAMED",
             "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
             "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
             "-cp", f"{classes}:{SPARK_CP}", "graft.Bench"], env=env)
    try:
        d = json.load(open(out))
        os.unlink(out)
        return d.get("queries", {}), d.get("canary_sec")
    except Exception:
        print(f"WARN: {tag} capture unparseable (exit {r.returncode}): "
              f"{r.stderr[-300:]}")
        return {}, None

def main():
    if len(sys.argv) < 3:
        sys.exit("usage: python3 tools/bench_ab.py <old-commit> <q1,q2,...> [reps]")
    commit, queries = sys.argv[1], [q for q in sys.argv[2].split(",") if q]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    short, old_classes = ensure_old_build(commit)
    new_classes = "target/scala-2.13/classes"
    print(f"Interleaved A/B: old={short} vs HEAD, {reps} alternating reps, "
          f"{len(queries)} flagged queries, {SF_DIR}, local[32], RUNS=2")
    old_t, new_t, canaries = {}, {}, []
    for rep in range(reps):
        for label, classes, acc in (("old", old_classes, old_t),
                                    ("new", new_classes, new_t)):
            qs, canary = bench_once(classes, queries, f"{label}{rep}")
            canaries.append(canary)
            for q, t in qs.items():
                acc.setdefault(q, []).append(t)
    cs = [c for c in canaries if c]
    if cs:
        print(f"canaries: {min(cs):.2f}-{max(cs):.2f}s across {len(cs)} invocations")
    print(f"\n{'query':40s} {'old reps':>24s} {'new reps':>24s}  verdict")
    regression, incomplete = False, []
    for q in queries:
        o, n = old_t.get(q, []), new_t.get(q, [])
        if len(o) < reps or len(n) < reps:
            # a green-looking "no regression" verdict over missing
            # measurements is worse than no artifact: a query absent
            # from the old binary, or ANY capture rep failing to parse
            # (a median over one surviving noisy sample is not
            # evidence), must fail the close gate loudly
            fo = "/".join(f"{t:.2f}" for t in o) or "missing"
            fn = "/".join(f"{t:.2f}" for t in n) or "missing"
            print(f"{q:40s} {fo:>24s} {fn:>24s}  "
                  f"NO DATA ({len(o)}/{reps} old, {len(n)}/{reps} new reps)")
            incomplete.append(q)
            continue
        om, nm = statistics.median(o), statistics.median(n)
        fo = "/".join(f"{t:.2f}" for t in o)
        fn = "/".join(f"{t:.2f}" for t in n)
        if nm <= om * 1.10:
            v = f"new median {nm:.2f} vs {om:.2f} — at/below"
        else:
            v = f"new median {nm:.2f} vs {om:.2f} — REGRESSION ({nm / om:.2f}x)"
            regression = True
        print(f"{q:40s} {fo:>24s} {fn:>24s}  {v}")
    if incomplete:
        print(f"\nINCOMPLETE — no measurements for: {', '.join(incomplete)}; "
              "this A/B is not adjudication evidence")
        sys.exit(2)
    print("\n" + ("REGRESSIONS FOUND — adjudicate before closing" if regression
                  else "no per-query regression beyond 10% of the old median"))

if __name__ == "__main__":
    main()

# Mechanical round close (r14 judge #1): two consecutive rounds of green
# engineering each shipped with an artifact-hygiene miss (r13: no driver
# correctness file adjudication; r14: BENCH_r14_full.json +
# CORRECTNESS_local_r14.json engineered but never committed, and
# SCALE.md claimed one of them WAS committed). This script makes the
# close checklist executable and FAILS LOUDLY if any artifact is
# missing, so "done" means "committed", not "engineered".
#
#   python3 tools/close_round.py <N>
#
# Checks (performing the purely mechanical ones itself):
#   1. BENCH_r{N}_full.json exists — if not, promotes bench_full.json
#      when its canary sits in the quiet band [0.47, 0.92]s; otherwise
#      prints the re-capture command and fails.
#   2. CORRECTNESS_local_r{N}.json exists, n_fail == 0, and the oracle
#      replay stayed inside its budget (the r12/r13 empty-driver-file
#      root cause was silent replay growth past the driver's budget).
#   3. Runs bench_diff vs round N-1 and writes ab/bench_diff_r{N}.txt;
#      SCALE.md must cite that artifact by name (paste or reference).
#   4. Every BENCH_*/CORRECTNESS_* artifact SCALE.md mentions actually
#      exists — the exact falsehood class the r14 verdict flagged
#      (SCALE.md:1137 cited a file that was never committed).
#   5. All required artifacts are git-tracked (committed or staged).
#   6. (r20+) ab/case_matrix_post_fold_r{N}.txt exists at 200 PASS /
#      0 FAIL — the case twin is a STANDING channel, not a one-time
#      r19 artifact (r19 verdict #2).
#   7. (r20+) ab/bench_flags_ab_r{N}.txt exists — the flagged movers
#      from check 3's bench_diff run through tools/bench_ab.py's
#      interleaved old/new-binary protocol automatically (r19 verdict
#      #6: single captures cannot rank rounds).
import json, os, re, shutil, subprocess, sys

CANARY_BAND = (0.47, 0.92)

if len(sys.argv) != 2 or not sys.argv[1].isdigit():
    sys.exit("usage: python3 tools/close_round.py <round-number>")
n = int(sys.argv[1])
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)
errs = []

def fail(msg, fix):
    errs.append(f"MISSING: {msg}\n    fix: {fix}")

# 1. per-query bench capture, canary-gated ------------------------------
bench = f"BENCH_r{n:02d}_full.json"
# -Xmx8g, NOT 96g: the committed in-band captures (r12/r13) ran via
# `sbt runMain` whose forked JVM uses -Xmx8g (build.sbt SPARK_DRIVER_MEM
# default); the 96g this command prescribed in r14/r15 inflates the
# canary ~1.4x through late-run G1 mixed collections — the measured
# root cause of three rounds of "out-of-band" captures (SCALE.md
# §round-16 canary forensics table).
recapture = ("SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 "
             "java -Xmx8g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' "
             f"graft.Bench && cp bench_full.json {bench}")
def _prev_bench_commit_unix():
    # commit time of the previous round's bench artifacts — any capture
    # stamped before this moment predates the current round and must
    # not be promoted as round N's (r15 advisor: a stale in-band
    # bench_full.json would otherwise be silently promoted)
    r = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--",
         f"BENCH_r{n - 1:02d}_full.json", f"BENCH_r{n - 1:02d}.json"],
        capture_output=True, text=True).stdout.strip()
    return int(r) if r else 0

# the capture file to promote: honor SPARK_GRAFT_BENCH_OUT exactly like
# graft.Bench does (r16 advisor: validating the hardcoded default path
# while a fresh capture went to the env path would leave an older
# same-round default-path file silently promotable — the stamped file
# this gate validates must be the one the capture actually wrote)
capture_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
if not os.path.exists(bench):
    if os.path.exists(capture_path):
        payload = json.load(open(capture_path))
        c = payload.get("canary_sec")
        stamp = payload.get("captured_unix")  # emitted by graft.Bench since r16
        floor_unix = _prev_bench_commit_unix()
        if c is None or not (CANARY_BAND[0] <= c <= CANARY_BAND[1]):
            fail(f"{bench}: {capture_path} canary {c}s outside quiet band "
                 f"{CANARY_BAND} — noisy capture, not promotable", recapture)
        elif stamp is None:
            fail(f"{bench}: {capture_path} has no captured_unix stamp — "
                 "pre-r16 capture of unknown provenance, not promotable",
                 recapture)
        elif stamp < floor_unix:
            fail(f"{bench}: {capture_path} captured_unix {stamp} predates "
                 f"round {n - 1}'s bench commit ({floor_unix}) — stale "
                 "capture from an earlier round, not promotable", recapture)
        else:
            shutil.copy(capture_path, bench)
            print(f"promoted {capture_path} -> {bench} "
                  f"(canary {c}s in band, stamp {stamp} fresh)")
    else:
        fail(f"{bench} (no {capture_path} to promote either)", recapture)
if os.path.exists(bench):
    c = json.load(open(bench)).get("canary_sec")
    if c is None or not (CANARY_BAND[0] <= c <= CANARY_BAND[1]):
        fail(f"{bench} canary {c}s outside quiet band {CANARY_BAND}", recapture)

# 2. local correctness twin, green + in-budget --------------------------
corr = f"CORRECTNESS_local_r{n:02d}.json"
corr_cmd = (f"sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r{n}' && "
            f"CHECK_JSON={corr} python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_r{n}")
if not os.path.exists(corr):
    fail(corr, corr_cmd)
else:
    d = json.load(open(corr))
    if d.get("n_fail", 1) != 0:
        fail(f"{corr} has n_fail={d.get('n_fail')} — round must close green", corr_cmd)
    if d.get("replay_over_budget"):
        fail(f"{corr}: oracle replay {d.get('oracle_replay_sec')}s exceeded its "
             f"budget of {d.get('replay_budget_sec')}s",
             "trim the slowest oracles (check.py prints them) before closing")

# 3. bench_diff artifact vs the previous round --------------------------
prev = f"BENCH_r{n - 1:02d}_full.json"
diff_art = f"ab/bench_diff_r{n:02d}.txt"
def _git_tracked(path):
    return subprocess.run(["git", "ls-files", "--error-unmatch", path],
                          capture_output=True).returncode == 0
if os.path.exists(diff_art) and _git_tracked(diff_art):
    # committed artifacts are immutable history: a re-run of this gate
    # (same round or a later round's adjudication) must VALIDATE them,
    # never regenerate them (r16 verdict #4 — the r15 close rewrote
    # ab/bench_diff_r16.txt, byte-identical only by luck of determinism)
    print(f"{diff_art} already committed — validating, not regenerating")
elif os.path.exists(prev) and os.path.exists(bench):
    os.makedirs("ab", exist_ok=True)
    r = subprocess.run([sys.executable, "tools/bench_diff.py", prev, bench],
                       capture_output=True, text=True)
    open(diff_art, "w").write(r.stdout + r.stderr)
    print(f"wrote {diff_art} ({len(r.stdout.splitlines())} lines)")
elif not os.path.exists(prev):
    print(f"note: {prev} absent — skipping bench_diff leg")
scale = open("SCALE.md").read() if os.path.exists("SCALE.md") else ""
# the round-N section: from its `## Round N …` heading to the next `## `
# heading (r15 advisor: scanning ALL of SCALE.md trips on historical
# prose that *narrates* a file as never committed — the gate is that the
# CURRENT round's section makes no phantom claims)
m = re.search(rf"^## Round {n}\b.*?(?=^## |\Z)", scale, re.M | re.S)
section = m.group(0) if m else ""
if not m:
    fail(f"SCALE.md has no `## Round {n}` section",
         f"write the round-{n} narrative section in SCALE.md")
if os.path.exists(diff_art) and os.path.basename(diff_art) not in section:
    fail(f"SCALE.md round-{n} section does not cite {diff_art}",
         f"paste or reference {diff_art} in the round-{n} SCALE.md section")

# 4. no phantom artifacts in the round-N SCALE.md section ---------------
cited = set(re.findall(r"\b(?:BENCH|CORRECTNESS)[A-Za-z0-9_]*\.json\b", section))
for f in sorted(cited):
    if not os.path.exists(f):
        fail(f"SCALE.md round-{n} section cites {f} but it does not exist "
             "in the tree", "create the artifact or correct the sentence")

# 6. the case twin is a STANDING channel (r19 verdict #2): every round
#    from 20 on must replay the full catalog on the case-planted corpus
#    (İ + word-final Σ — the DuckDB-simple vs JVM-full mapping boundary)
#    and commit the matrix. Without this gate a new lower()-using oracle
#    could silently reopen the boundary the r19 fold closed (the static
#    OracleLintSpec fold lint is the compile-time half of the same gate).
case_art = f"ab/case_matrix_post_fold_r{n:02d}.txt"
case_cmd = (f"python3 tools/unicode_corpus.py /root/testdata/sf0.01 /tmp/sfcase case && "
            f"SPARK_GRAFT_CPUS=16 sbt -batch 'runMain graft.Verify /tmp/sfcase /tmp/v_case' && "
            f"python3 tools/check.py /tmp/sfcase /tmp/v_case > {case_art}")
if n >= 20:
    if not os.path.exists(case_art):
        fail(f"{case_art} (the standing case-twin replay)", case_cmd)
    else:
        lines = open(case_art).read().splitlines()
        n_pass = sum(1 for l in lines if l.startswith("PASS "))
        n_fail = sum(1 for l in lines if l.startswith("FAIL"))
        if n_fail or n_pass < 200:
            fail(f"{case_art}: {n_pass} PASS / {n_fail} FAIL — the case twin "
                 "must replay green on the full catalog", case_cmd)

# 6b. the unicode twin is a STANDING channel too (generated every round
#     since r18, required since r20): the full catalog replays on the
#     non-ASCII planted corpus, pinning the whitespace/normalization/
#     byte-vs-char contracts the ASCII corpus cannot reach. Same class
#     of gate as the case twin — without it a round could silently ship
#     on the ASCII corpus alone.
uni_art = f"CORRECTNESS_unicode_r{n:02d}.json"
uni_cmd = (f"python3 tools/unicode_corpus.py /root/testdata/sf0.01 /tmp/sfni && "
           f"SPARK_GRAFT_CPUS=16 sbt -batch 'runMain graft.Verify /tmp/sfni /tmp/v_ni' && "
           f"CHECK_JSON={uni_art} python3 tools/check.py /tmp/sfni /tmp/v_ni")
if n >= 20:
    if not os.path.exists(uni_art):
        fail(f"{uni_art} (the standing unicode-twin replay)", uni_cmd)
    else:
        d = json.load(open(uni_art))
        if d.get("n_fail", 1) != 0 or not d.get("full_catalog"):
            fail(f"{uni_art}: n_fail={d.get('n_fail')}, "
                 f"full_catalog={d.get('full_catalog')} — the unicode twin "
                 "must replay green on the full catalog", uni_cmd)

# 7. the interleaved A/B is the headline bench diff (r19 verdict #6):
#    single sf0.1 captures cannot rank rounds (r19's driver and builder
#    totals disagreed in SIGN on the same code), so the flagged movers
#    from step 3's bench_diff go through tools/bench_ab.py — alternating
#    old/new binaries — automatically, and the artifact is required.
ab_art = f"ab/bench_flags_ab_r{n:02d}.txt"
def _flagged_from_diff(path, cap=10):
    # returns (worst `cap` movers, the ones the cap drops) — bench_diff
    # sorts worst-regressions-first, so the dropped tail is the
    # improvements; the caller records the truncation in the artifact
    # instead of silently presenting a partial A/B as full coverage
    qs, in_flags = [], False
    for l in open(path).read().splitlines():
        if l.startswith("flagged ("):
            in_flags = True
        elif in_flags:
            m2 = re.match(r"\s+(\S+)\s+[\d.]+s -> ", l)
            if m2: qs.append(m2.group(1))
            else: in_flags = False
    return qs[:cap], qs[cap:]
def _ab_artifact_invalid(path):
    # content rules mirrored from the regeneration path: a committed
    # artifact is immutable history but must still BE evidence — header
    # present, a closing verdict (either outcome; adjudication of
    # REGRESSIONS lives in SCALE.md), and no incomplete/NO DATA rows.
    # Without this, a bad artifact once committed would satisfy the
    # gate forever (contrast check 6, which re-parses the case matrix).
    body = open(path).read()
    if "Interleaved A/B:" not in body and "no flagged movers" not in body:
        return "missing the A/B header"
    if "INCOMPLETE" in body or "NO DATA" in body:
        return "contains INCOMPLETE/NO DATA rows"
    if ("Interleaved A/B:" in body
            and not ("no per-query regression" in body
                     or "REGRESSIONS FOUND" in body)):
        return "missing the closing verdict line"
    return None
if os.path.exists(ab_art) and _git_tracked(ab_art):
    bad = _ab_artifact_invalid(ab_art)
    if bad:
        fail(f"{ab_art} is committed but {bad} — not valid adjudication "
             "evidence", "re-run tools/bench_ab.py (exit 0, complete table) "
             f"and commit the new {ab_art}")
    else:
        print(f"{ab_art} already committed — validated (header, verdict, "
              "no missing rows)")
elif os.path.exists(diff_art):
    flagged, dropped = _flagged_from_diff(diff_art)
    if flagged:
        old_commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--",
             f"BENCH_r{n - 1:02d}_full.json"],
            capture_output=True, text=True).stdout.strip()
        if old_commit:
            print(f"running interleaved A/B of {len(flagged)} flagged movers "
                  f"vs {old_commit[:9]} (this compiles the old binary once)")
            r = subprocess.run([sys.executable, "tools/bench_ab.py",
                                old_commit, ",".join(flagged)],
                               capture_output=True, text=True)
            body = r.stdout + r.stderr
            if dropped:
                body += (f"\nNOTE: bench_diff flagged {len(flagged) + len(dropped)} "
                         f"movers; A/B capped to the worst {len(flagged)} — not run: "
                         f"{', '.join(dropped)}\n")
            open(ab_art, "w").write(body)
            print(f"wrote {ab_art}")
            # a crashed or incomplete A/B run must not satisfy the gate:
            # bench_ab exits 2 on NO DATA rows and nonzero on any crash,
            # and a healthy artifact always carries its header + a
            # closing verdict line (same spirit as check 6's PASS count)
            if (r.returncode != 0
                    or "Interleaved A/B:" not in body
                    or not ("no per-query regression" in body
                            or "REGRESSIONS FOUND" in body)):
                fail(f"{ab_art}: bench_ab exited {r.returncode} or wrote an "
                     "incomplete artifact — not valid adjudication evidence",
                     f"python3 tools/bench_ab.py {old_commit[:9]} "
                     f"{','.join(flagged)} > {ab_art}")
        else:
            fail(f"{ab_art}: cannot locate round {n-1}'s bench commit for the "
                 "old binary", f"python3 tools/bench_ab.py <old-commit> {','.join(flagged)} > {ab_art}")
    else:
        open(ab_art, "w").write(
            f"Round {n} bench_diff flagged no per-query movers beyond the "
            "noise band (see " + diff_art + ") — no interleaved A/B needed; "
            "raw totals remain context, not signal.\n")
        print(f"wrote {ab_art} (no flagged movers)")
if n >= 20 and not os.path.exists(ab_art):
    fail(f"{ab_art} (the interleaved A/B of flagged movers)",
         "run tools/close_round.py again after step 3's bench_diff exists")

# 8. everything above must be git-tracked -------------------------------
tracked = set(subprocess.run(["git", "ls-files"], capture_output=True,
                             text=True).stdout.split())
staged = set(subprocess.run(["git", "diff", "--cached", "--name-only"],
                            capture_output=True, text=True).stdout.split())
for f in [bench, corr, diff_art] + ([case_art, uni_art, ab_art] if n >= 20 else []):
    if os.path.exists(f) and f not in tracked and f not in staged:
        fail(f"{f} exists but is not git-tracked", f"git add {f} && git commit")

if errs:
    print(f"\nround {n} close: {len(errs)} problem(s)\n")
    print("\n".join(errs))
    sys.exit(1)
print(f"\nround {n} close: all artifacts present, green, in-band, and tracked")

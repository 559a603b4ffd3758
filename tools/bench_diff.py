# Canary-normalized bench diff (VERDICT r13 #5): joins two
# BENCH_*_full.json captures, scales the "after" per-query times by the
# canary ratio (same-machine ambient drift — r13's ~9% had to be
# triaged by hand), and flags per-query deltas beyond a noise band.
#
#   python3 tools/bench_diff.py BENCH_r13_full.json /tmp/bench_now.json
#   python3 tools/bench_diff.py old.json new.json --band 0.25 --min-sec 0.3
#
# A query is flagged only if BOTH the normalized ratio leaves the band
# AND the absolute normalized delta exceeds --min-sec (sub-100ms rows
# flap on scheduler noise regardless of ratio).
import argparse, json, signal, sys
# exit quietly when piped into `head`
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

ap = argparse.ArgumentParser()
ap.add_argument("old"); ap.add_argument("new")
ap.add_argument("--band", type=float, default=0.20,
                help="relative band around 1.0 that counts as noise (default 0.20)")
ap.add_argument("--min-sec", type=float, default=0.25,
                help="minimum absolute normalized delta to flag (default 0.25s)")
args = ap.parse_args()

old = json.load(open(args.old))
new = json.load(open(args.new))
co, cn = old.get("canary_sec"), new.get("canary_sec")
if co and cn:
    norm = co / cn   # multiply "new" times by this to express them in old-canary units
    print(f"canary: old={co:.3f}s new={cn:.3f}s -> normalizing new by x{norm:.3f}")
else:
    norm = 1.0
    print("WARN: canary_sec missing in one capture; comparing raw times")

qo, qn = old["queries"], new["queries"]
only_old = sorted(set(qo) - set(qn))
only_new = sorted(set(qn) - set(qo))
rows = []
for q in sorted(set(qo) & set(qn)):
    o, n = qo[q], qn[q] * norm
    rows.append((n - o, n / o if o > 0 else float("inf"), q, o, n))

tot_o = sum(qo[q] for _, _, q, _, _ in rows)
tot_n = sum(n for _, _, _, _, n in rows)
print(f"shared {len(rows)} queries: old {tot_o:.1f}s -> new(normalized) {tot_n:.1f}s "
      f"({(tot_n / tot_o - 1) * 100:+.1f}%)")
if only_old: print(f"only in old: {', '.join(only_old)}")
if only_new: print(f"only in new: {', '.join(only_new)}")

flagged = [r for r in rows
           if abs(r[1] - 1) > args.band and abs(r[0]) > args.min_sec]
if flagged:
    print(f"\nflagged (|ratio-1| > {args.band} AND |delta| > {args.min_sec}s), "
          "worst regressions first:")
    for d, r, q, o, n in sorted(flagged, reverse=True):
        print(f"  {q:40s} {o:7.2f}s -> {n:7.2f}s  ({r:5.2f}x, {d:+.2f}s)")
else:
    print(f"\nno per-query delta beyond the noise band "
          f"(|ratio-1| <= {args.band} or |delta| <= {args.min_sec}s)")
sys.exit(0)

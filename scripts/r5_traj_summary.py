"""Print the eval-PSNR trajectory (step -> test_psnr) for each run under
the given logs dirs, plus best/final/drift — the table source for
RESULTS.md's 100k-horizon section."""
import json, sys, glob, os

for pat in sys.argv[1:]:
    for mdir in sorted(glob.glob(pat)):
        f = os.path.join(mdir, "metrics.jsonl")
        if not os.path.exists(f):
            continue
        tr = []
        for line in open(f):
            r = json.loads(line)
            if "test_psnr" in r:
                tr.append((r["step"], round(r["test_psnr"], 2)))
        if not tr:
            continue
        best = max(tr, key=lambda t: t[1])
        print(f"== {mdir}")
        print("  traj:", " ".join(f"{s//1000}k:{p}" for s, p in tr))
        print(f"  best {best[1]} @ {best[0]}; final {tr[-1][1]} @ {tr[-1][0]}; "
              f"drift(final-best) {round(tr[-1][1]-best[1], 2)}")

"""Snapshot the text evidence under logs/ into the committed evidence/ tree.

logs/ is gitignored (checkpoints + renders are too heavy to commit), so
the quality artifacts RESULTS.md cites are lost whenever the workspace
is refreshed. This copies just the small TEXT artifacts — psnr.txt,
experiments_results.txt sweep grids, A/B jsons, config/args provenance —
preserving relative paths, and distills each metrics.jsonl into its eval
trajectory (step, test_psnr) so the training curves survive too.

Usage: python scripts/snapshot_evidence.py   (then git add evidence/)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")
OUT = os.path.join(REPO, "evidence")

COPY_NAMES = {"psnr.txt", "experiments_results.txt", "config.txt", "args.txt"}
COPY_SUFFIXES = ("_ab.json",)


def main() -> int:
    copied, distilled = [], []
    for dirpath, _dirnames, filenames in os.walk(LOGS):
        rel = os.path.relpath(dirpath, LOGS)
        for name in sorted(filenames):
            src = os.path.join(dirpath, name)
            relpath = os.path.normpath(os.path.join(rel, name))
            if name in COPY_NAMES or name.endswith(COPY_SUFFIXES):
                dst = os.path.join(OUT, relpath)
                if os.path.exists(dst):
                    # leave-existing-files policy (MANIFEST.md): committed
                    # evidence cited by earlier RESULTS sections must keep
                    # the contents of the workspace that produced those
                    # numbers; later regenerations are equivalent but not
                    # bit-identical.
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
                copied.append(relpath)
            elif name == "metrics.jsonl":
                rows = []
                with open(src) as f:
                    for line in f:
                        try:
                            r = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        if "test_psnr" in r:
                            rows.append(
                                {"step": r.get("step"), "test_psnr": round(r["test_psnr"], 3)}
                            )
                dst = os.path.join(OUT, os.path.normpath(os.path.join(rel, "eval_trajectory.json")))
                if os.path.exists(dst):
                    continue  # leave-existing-files policy (see above)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                with open(dst, "w") as f:
                    json.dump(rows, f, indent=1)
                distilled.append(os.path.relpath(dst, OUT))

    if not copied and not distilled:
        # A fresh workspace has no logs/ tree (it is gitignored): bail out
        # rather than rewriting the committed MANIFEST to claim "0 files"
        # over stale-but-valid evidence artifacts.
        print(
            "no artifacts found under logs/ — regenerate with "
            "scripts/e2e_round3.sh first; leaving evidence/ untouched",
            file=sys.stderr,
        )
        return 1

    # MANIFEST.md carries hand-written provenance per snapshot batch — it
    # is NOT rewritten here (a rewrite erases the per-round history).
    # Append the provenance of the new batch to it manually.
    print(f"copied {len(copied)} files, distilled {len(distilled)} trajectories -> evidence/")
    print("remember: append this batch's provenance to evidence/MANIFEST.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Run a chip command under a stall watchdog, restarting it if it wedges.

The axon tunnel occasionally drops a client's backend connection
mid-initialization; the jax process then blocks forever on a futex with
zero CPU progress and no TCP connection to the relay (observed twice in
the round-5 chain: a render and a 100k depth run, each burning ~30 min
before manual diagnosis). Known-good signature of the wedge, verified
against healthy runs: CPU time frozen for minutes at a stretch where a
healthy process is either compiling (CPU-hot) or stepping (steady
accrual).

This wrapper polls the child's cumulative CPU time every POLL seconds
and kills + restarts it (resume-from-checkpoint semantics are the
trainer's own: it reloads the latest .npz in basedir) if CPU advances
less than MIN_ADVANCE over STALL_WINDOW. Retries up to --tries times.

Usage: python scripts/run_with_watchdog.py [--tries N] -- cmd arg...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

POLL = 30.0  # seconds between CPU samples
# Healthy processes can sit minutes at ~0 CPU waiting for the chip grant
# (observed up to ~25 min), but after killing a stuck one the next dial
# got the grant in <2 min — so a 10-min window + restart both catches
# true wedges and breaks pathological grant queues.
STALL_WINDOW = 600.0  # stall declared if no progress over this window
MIN_ADVANCE = 2.0  # seconds of CPU the window must show to count as alive
_CLK = os.sysconf("SC_CLK_TCK")


def _cpu_seconds(pid: int) -> float | None:
    """utime+stime of pid (not children), None once it is gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / _CLK
    except (FileNotFoundError, ProcessLookupError, IndexError):
        return None


def run_once(cmd: list[str]) -> tuple[bool, int]:
    """Returns (wedged, returncode)."""
    child = subprocess.Popen(cmd)
    window_start = time.monotonic()
    cpu_at_window_start = 0.0
    while True:
        rc = child.poll()
        if rc is not None:
            return False, rc
        time.sleep(POLL)
        cpu = _cpu_seconds(child.pid)
        if cpu is None:
            continue  # exited between poll() and the sample; loop to reap
        if cpu - cpu_at_window_start >= MIN_ADVANCE:
            window_start = time.monotonic()
            cpu_at_window_start = cpu
        elif time.monotonic() - window_start > STALL_WINDOW:
            print(
                f"[watchdog] pid {child.pid} stalled: cpu {cpu:.1f}s "
                f"advanced <{MIN_ADVANCE}s in {STALL_WINDOW:.0f}s — killing",
                flush=True,
            )
            child.send_signal(signal.SIGTERM)
            try:
                child.wait(timeout=30)
            except subprocess.TimeoutExpired:
                child.kill()
                child.wait()
            return True, -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tries", type=int, default=3)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    for attempt in range(1, args.tries + 1):
        print(f"[watchdog] attempt {attempt}/{args.tries}: {' '.join(cmd)}",
              flush=True)
        wedged, rc = run_once(cmd)
        if not wedged:
            print(f"[watchdog] exited rc={rc}", flush=True)
            return rc
        # wedge: the killed process's chip grant may linger; brief pause
        time.sleep(60)
    print("[watchdog] giving up after repeated stalls", flush=True)
    return 97


if __name__ == "__main__":
    sys.exit(main())

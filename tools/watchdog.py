#!/usr/bin/env python
"""Hang watchdog: run a training command, SIGKILL + relaunch it when progress
stalls (VERDICT r4 next #7).

The failure mode this automates is documented in `logs_ours/README.md`: the
tunneled-TPU backend occasionally leaves the trainer's main thread futex-
blocked on a device fetch (flat utime, `wchan=futex_do_wait`), SIGTERM is
absorbed by the hung dispatch, and the only recovery is SIGKILL + relaunch —
the trainer auto-resumes from the newest checkpoint in its expdir (the same
passive-recovery contract as the reference, `DS_NeRF/run.py:1647-1670`).
Three multi-hour runs in round 4 needed a human to notice the stall; this
closes the loop.

Progress signal: the mtime of a progress file (normally the run's
`metrics.jsonl`, flushed every `i_print` steps). A separate startup grace
covers cold compiles (~2-6 min through the tunnel) before the first write.

Usage:
    python tools/watchdog.py --progress-file logs_ours/EXP/metrics.jsonl \
        [--stall-seconds 900] [--grace-seconds 2400] [--cooldown-seconds 120] \
        [--max-restarts 6] -- python run.py --config ... --expname EXP ...

Exit code: the child's exit code from its final (non-stalled) run, or 17 if
the restart budget is exhausted.

The child runs in its own session (process group) and the kill targets that
exact group id — never a name/pattern match.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

EXIT_BUDGET_EXHAUSTED = 17


def _mtime(path: str) -> float | None:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return None


def run_with_watchdog(
    cmd: list[str],
    progress_file: str,
    stall_seconds: float = 900.0,
    grace_seconds: float = 2400.0,
    cooldown_seconds: float = 120.0,
    max_restarts: int = 6,
    poll_seconds: float = 5.0,
    restart_on_crash: bool = True,
    log=print,
) -> int:
    """Run `cmd`, restarting it whenever `progress_file` stops advancing.

    Returns the child's exit code, or EXIT_BUDGET_EXHAUSTED after
    `max_restarts` stall-kills.
    """
    restarts = 0
    while True:
        log(f"[watchdog] launch (attempt {restarts + 1}): {' '.join(cmd)}")
        t_launch = time.time()
        baseline = _mtime(progress_file)
        child = subprocess.Popen(cmd, start_new_session=True)
        crashed = False
        while True:
            rc = child.poll()
            if rc is not None:
                if rc != 0 and restart_on_crash:
                    # TPU-worker crashes exit nonzero; the trainer auto-
                    # resumes from its newest checkpoint on relaunch (same
                    # protocol as a stall kill). The restart budget bounds
                    # deterministic-failure loops.
                    log(f"[watchdog] child CRASHED rc={rc}")
                    crashed = True
                    break
                log(f"[watchdog] child exited rc={rc}")
                return rc
            time.sleep(poll_seconds)
            mt = _mtime(progress_file)
            now = time.time()
            if mt is not None and (baseline is None or mt > baseline):
                last_progress = mt
            else:
                last_progress = None
            if last_progress is not None:
                idle = now - last_progress
                limit = stall_seconds
            else:
                # no progress observed yet this incarnation: startup grace
                idle = now - t_launch
                limit = grace_seconds
            if idle > limit:
                break
        if not crashed:
            # stall: SIGKILL the whole process group (SIGTERM is absorbed by
            # the hung dispatch — observed in all three r4 hangs)
            log(
                f"[watchdog] STALL: no progress on {progress_file} for "
                f"{idle:.0f}s (> {limit:.0f}s) — SIGKILL pg {child.pid}"
            )
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass
            try:
                child.wait(timeout=60)
            except subprocess.TimeoutExpired:
                log("[watchdog] child did not reap within 60s; continuing")
        restarts += 1
        if restarts > max_restarts:
            log(f"[watchdog] restart budget ({max_restarts}) exhausted")
            return EXIT_BUDGET_EXHAUSTED
        # the tunnel recovers by itself within minutes of the hang; give it
        # time before relaunching or the fresh process hangs at init
        log(f"[watchdog] cooldown {cooldown_seconds:.0f}s before relaunch")
        time.sleep(cooldown_seconds)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--progress-file", required=True,
                    help="file whose mtime advancing == progress "
                         "(the run's metrics.jsonl)")
    ap.add_argument("--stall-seconds", type=float, default=900.0,
                    help="kill+restart after this long without progress "
                         "once the run has produced any (default 15 min)")
    ap.add_argument("--grace-seconds", type=float, default=2400.0,
                    help="allowance before the FIRST progress of each "
                         "incarnation (covers cold compile; default 40 min)")
    ap.add_argument("--cooldown-seconds", type=float, default=120.0)
    ap.add_argument("--max-restarts", type=int, default=6)
    ap.add_argument("--poll-seconds", type=float, default=5.0)
    ap.add_argument("--no-restart-on-crash", action="store_true",
                    help="only restart on stalls; let nonzero exits through")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the training command")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (append: -- python run.py ...)")
    return run_with_watchdog(
        cmd,
        progress_file=args.progress_file,
        stall_seconds=args.stall_seconds,
        grace_seconds=args.grace_seconds,
        cooldown_seconds=args.cooldown_seconds,
        max_restarts=args.max_restarts,
        poll_seconds=args.poll_seconds,
        restart_on_crash=not args.no_restart_on_crash,
    )


if __name__ == "__main__":
    sys.exit(main())

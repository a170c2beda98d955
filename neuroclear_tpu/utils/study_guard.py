"""Quiesce a running background quality study before claiming the chip/CPU.

Used by the two driver-captured round-end entry points (`bench.py` and
`__graft_entry__.dryrun_multichip`): both must run with the machine to
themselves — the study drivers otherwise contend for the single TPU chip
(bench) or the single host core (CPU-mesh dryrun), and long-lived axon
tunnel clients can wedge when starved.

Protocol (cooperative first, then forceful):
  1. touch .study/STOP — run_quality_study.sh / run_study_queue.sh check it
     before starting each segment, eval, or next study;
  2. SIGTERM then SIGKILL the recorded process groups (.study/study.pgid for
     the driver loop, .study/*/child.pgid for the GNU-timeout children which
     setpgid() into their own groups);
  3. bank the latest complete checkpoint set of every study run into the
     git-tracked study_state/ dir so the round-end commit preserves the
     training progress (resume is exact: optimizer + LR position restore,
     models/base_model.py).
"""

import glob
import os
import signal
import subprocess
import sys
import time


def stop_running_study(bank: bool = True, log=None) -> None:
    log = log or (lambda msg: print(msg, file=sys.stderr))

    # Cooperative stop FIRST: even a driver loop whose pgid was never
    # recorded (e.g. launched as a plain background shell) stops instead of
    # starting new chip work underneath us.
    if os.path.isdir(".study"):
        try:
            open(".study/STOP", "w").close()
        except OSError:
            pass

    pgfs = [".study/study.pgid"] + glob.glob(".study/*/child.pgid")
    pgids = []
    for pgf in pgfs:
        try:
            pgids.append(int(open(pgf).read().strip()))
        except (ValueError, OSError):
            continue
    if not pgids:
        if os.path.isdir(".study"):
            time.sleep(4)  # let a STOP-checking driver loop notice and exit
        return
    killed = False
    for pgid in pgids:
        try:
            os.killpg(pgid, signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            continue
        killed = True
        log(f"# stopped study process group {pgid}")
    if killed:
        time.sleep(6)
        for pgid in pgids:
            try:
                os.killpg(pgid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        time.sleep(4)
    for pgf in pgfs:
        try:
            os.remove(pgf)
        except OSError:
            pass
    if not bank:
        return
    for run_dir in glob.glob(".study/ckpt_*/*/"):
        run_dir = run_dir.rstrip("/")
        ckpt_root, name = os.path.split(run_dir)
        # bank_study_state.sh exits 1 when the run dir holds no COMPLETE
        # checkpoint set (no iter_*_optim.npz) — not an error here, but any
        # other failure is training progress silently lost, so say so loudly
        # and leave the stderr in the log.  The script cd's to its OWN parent
        # dir, so the cwd-relative copy (if present) keeps the relative
        # ckpt_root anchored to the caller's tree; fall back to the repo's.
        script = "scripts/bank_study_state.sh"
        if not os.path.exists(script):
            script = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                "scripts", "bank_study_state.sh")
        try:
            r = subprocess.run([script, ckpt_root, name], timeout=600,
                               capture_output=True, text=True)
        except Exception as e:  # banking must never break the caller
            log(f"# BANK FAILED for {name}: {e}")
            continue
        if r.returncode == 0:
            log(f"# banked study state for {name}: "
                f"{(r.stdout or '').strip()}")
        else:
            log(f"# BANK FAILED for {name} (rc={r.returncode}): "
                f"{(r.stderr or '').strip()}")

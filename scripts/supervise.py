"""Elastic supervisor: restart a training command across crashes/outages.

The reference has no fault tolerance (a crashed rank kills the job,
SURVEY.md §5). Here the trainer already writes step-level crash
checkpoints (`train.checkpoint_interval_steps` -> <workdir>/model_latest)
with full optimizer state; this supervisor completes the story:

  python scripts/supervise.py --workdir output/run1 --max-restarts 10 -- \
      python scripts/run.py -c config/transductive/inference.yaml \
      --dataset FB15k237 --epochs 10 ...

- pins ULTRA_WORKDIR so every (re)start shares one working directory;
- on restart, points ULTRA_RESUME_FROM at <workdir>/model_latest (the
  runner resumes params + optimizer state; ignored when absent);
- before each (re)start, probes the accelerator backend in a subprocess
  under a hard timeout and WAITS (bounded backoff) while it is down — the
  tunneled-TPU failure mode here is a hang, not an exception, so an
  unsupervised restart loop would burn all its restarts during one outage;
- exponential backoff between crash restarts; propagates the final rc.
"""

import argparse
import os
import subprocess
import sys
import time

PROBE = (
    "import os;"
    "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
    " '/root/.cache/jax-comp-cache');"
    "import jax, jax.numpy as jnp;"
    "print(jax.devices());"
    "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"
)


def log(*a):
    print("[supervise]", *a, file=sys.stderr, flush=True)


def backend_up(timeout: int) -> bool:
    try:
        proc = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True, timeout=timeout
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(probe_timeout: int, poll_s: int, max_wait_s: int) -> bool:
    waited = 0
    while not backend_up(probe_timeout):
        if waited >= max_wait_s:
            return False
        log(f"backend down; retrying in {poll_s}s "
            f"(waited {waited}/{max_wait_s}s)")
        time.sleep(poll_s)
        waited += poll_s + probe_timeout
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--probe-timeout", type=int, default=180)
    ap.add_argument("--backend-poll", type=int, default=120)
    ap.add_argument("--backend-max-wait", type=int, default=6 * 3600)
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the accelerator preflight (CPU jobs/tests)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- <command to supervise>")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (append: -- python scripts/run.py ...)")

    os.makedirs(args.workdir, exist_ok=True)
    ckpt = os.path.join(args.workdir, "model_latest")
    env = dict(os.environ, ULTRA_WORKDIR=args.workdir)

    backoff = 30
    for attempt in range(args.max_restarts + 1):
        if not args.no_probe and not wait_for_backend(
            args.probe_timeout, args.backend_poll, args.backend_max_wait
        ):
            log("backend never came up within the wait budget")
            sys.exit(75)  # EX_TEMPFAIL
        if attempt and os.path.exists(ckpt):
            env["ULTRA_RESUME_FROM"] = ckpt
            log(f"restart {attempt}: resuming from {ckpt}")
        elif attempt:
            log(f"restart {attempt}: no crash checkpoint yet, fresh start")
        rc = subprocess.call(cmd, env=env)
        if rc == 0:
            log("command completed")
            sys.exit(0)
        log(f"command exited rc={rc}; backoff {backoff}s "
            f"({attempt + 1}/{args.max_restarts} restarts used)")
        if attempt == args.max_restarts:
            break
        time.sleep(min(backoff, int(os.environ.get("SUPERVISE_MAX_BACKOFF", "600"))))
        backoff = min(backoff * 2, 600)
    log("restart budget exhausted")
    sys.exit(rc)


if __name__ == "__main__":
    main()

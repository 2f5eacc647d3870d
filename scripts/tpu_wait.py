"""Wait for the axon TPU to answer: one claim attempt at a time, no
timeouts (killing a claim mid-flight can wedge the chip grant — see
ROADMAP item 8 / the hw_session.sh header). Prints a timestamped line
per attempt; exits 0 the moment a matmul round-trips on the chip.

Run it in the background and tail the log; NEVER run another
TPU-touching process while this is up.

    PYTHONPATH=/root/.axon_site:. python -u scripts/tpu_wait.py
"""

import datetime
import subprocess
import sys
import time

ATTEMPT = r"""
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256))
s = float((x @ x).sum())
print("OK", jax.default_backend(), d, s, round(time.time() - t0, 1),
      flush=True)
"""


def main():
    pause = 60
    for i in range(10_000):
        now = datetime.datetime.now().isoformat(timespec="seconds")
        print(f"[{now}] attempt {i}", flush=True)
        p = subprocess.run([sys.executable, "-u", "-c", ATTEMPT],
                           capture_output=True, text=True)
        out = (p.stdout + p.stderr).strip().splitlines()
        tail = out[-1] if out else "(no output)"
        print(f"  rc={p.returncode} {tail[:200]}", flush=True)
        if p.returncode == 0 and "OK" in p.stdout:
            print("TPU LIVE", flush=True)
            return 0
        time.sleep(pause)
    return 1


if __name__ == "__main__":
    sys.exit(main())

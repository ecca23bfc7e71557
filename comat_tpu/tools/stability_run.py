"""10-step SD1.5 stability run on the real chip: sustained step times,
finite losses, LoRA drift. Evidence that full-geometry training holds
up beyond the 3-step bench window."""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
)
from bench import build  # noqa: E402


def main(steps: int = 10, batch_size: int = 4):
    pipe, blip, step, state, frozen, blip_params, batch, tcfg = build(
        batch_size
    )
    rng = jax.random.PRNGKey(11)
    compiled = step.lower(state, frozen, blip_params, batch, rng).compile()
    times, losses = [], []
    for i in range(steps):
        t0 = time.perf_counter()
        state, _, m = compiled(state, frozen, blip_params, batch, rng)
        loss = float(jax.device_get(m["step_loss"]))
        times.append(time.perf_counter() - t0)
        losses.append(loss)
        print(f"step {i}: {times[-1]:.2f}s loss={loss:.4f} "
              f"reward={float(jax.device_get(m['reward_blip'])):.4f}",
              flush=True)
    steady = times[2:]
    print(f"steady-state: {np.mean(steady):.2f}s/step "
          f"({batch_size/np.mean(steady):.3f} imgs/s/chip), "
          f"all finite: {np.isfinite(losses).all()}")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)

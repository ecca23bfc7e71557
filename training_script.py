"""CoMat TPU training entry point.

Flag-compatible with the reference `training_script.py` (launched by
scripts/sd15.sh / scripts/sdxl.sh). On TPU there is no accelerate
launcher: run one process per host; `jax.distributed.initialize()`
wires multi-host meshes automatically under TPU runtimes.
"""

from __future__ import annotations

import os


def main():
    from comat_tpu.training.arguments import parse_args
    from comat_tpu.training.trainer import Trainer

    args = parse_args()

    # Multi-host init (replaces accelerate/NCCL — node8.yaml). Safe to
    # skip on single-process runs.
    try:
        import jax

        if (
            os.environ.get("COMAT_TPU_DISTRIBUTED", "0") == "1"
            and jax.process_count() == 1
        ):
            jax.distributed.initialize()
    except Exception:
        pass

    trainer = Trainer(args)
    trainer.train()


if __name__ == "__main__":
    main()

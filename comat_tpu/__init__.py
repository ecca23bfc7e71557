"""comat_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the CoMat
text-to-image alignment fine-tuning framework (CaraJ7/CoMat, NeurIPS 2024).

CoMat fine-tunes Stable Diffusion (1.5 / XL) LoRA adapters by generating
images *online* inside the training step via a differentiable multi-step
DDPM sampling loop and backpropagating three losses through it:

1. Concept matching  — frozen BLIP captioner cross-entropy reward
   (reference: concept_mat_utils/caption_blip.py).
2. Attribute concentration — cross-attention maps pushed to agree with
   segmentation masks of each noun (reference: attr_concen_utils/,
   attn_utils/tc_loss_utils.py).
3. Fidelity preservation — latent-space GAN against pre-generated
   base-model latents (reference: training_utils/gan_sdxl.py).

This package is a ground-up TPU-first re-design, NOT a port: the
reference's imperative grad-toggled Python denoise loop
(TrainableSDPipeline.py:132-185) becomes a two-pass structure —
an inference `lax.scan` followed by a differentiable K-segment replay —
its monkey-patched attention capture (attn_utils/tc_attn_utils.py)
becomes a pure-functional capture mode on Pallas fused attention, and
its accelerate/NCCL data parallelism (node8.yaml) becomes GSPMD sharding
over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from comat_tpu.ops.attention import multi_head_attention

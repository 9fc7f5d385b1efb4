"""owlvit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) OWL-ViT detection framework.

A ground-up rebuild of the capabilities of stevebottos/owl-vit-object-detection
(reference at /root/reference) designed for TPU hardware:

  * pure-functional models (params as pytrees), single jit-compiled train step
  * bf16 compute / fp32 master params
  * Pallas flash-attention for the ViT encoder
  * jit-compatible Hungarian matching (no per-step host round-trip)
  * batched training (the reference is batch=1 only) with padded ground truth
  * GSPMD data/tensor parallelism over a `jax.sharding.Mesh`
  * Orbax checkpointing (the reference never saves the model)

Subpackages:
  models/    ViT + CLIP text encoders, detection heads, checkpoint conversion
  ops/       box geometry, matching, losses, NMS, preprocessing, Pallas kernels
  parallel/  mesh + sharding rules
  data/      COCO subset pipeline, synthetic data, tokenizer, prefetch loader
  train/     train/eval driver, checkpointing, metrics
  utils/     config, logging, progress reporting
"""

__version__ = "0.1.0"

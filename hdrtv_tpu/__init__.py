"""hdrtv_tpu — TPU-native real-time SDR→HDR10 conversion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
DanHelmy/hdr-realtime-video-pipeline (HDRTVNet++ SDR→HDR10 real-time
conversion, quantization, export, benchmarking), designed TPU-first:

- NHWC tensors end-to-end (the decoded HWC frame *is* the network layout —
  no transposes on the hot path).
- One functional core: models are pure functions over flat parameter pytrees
  keyed by the reference checkpoint's own state-dict names, so weight import
  is lossless and parity is auditable key-by-key.
- Precision via dtype policies (fp32/bf16) and int8 W8/W8A8 layers whose
  numerics mirror the reference eager-INT8 design
  (/root/reference/src/models/hdrtvnet_torch.py:233-445).
- `jax.jit` + the XLA persistent compilation cache replace TensorRT engines;
  Pallas kernels replace Triton for the fused per-pixel output slice.
- Scale-out via `jax.sharding.Mesh` (frame-batch DP + spatial W-sharding with
  GSPMD halo exchange), not NCCL.
"""

__version__ = "0.1.0"

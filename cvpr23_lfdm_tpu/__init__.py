"""cvpr23_lfdm_tpu: TPU-native Latent Flow Diffusion Models (LFDM).

A ground-up JAX/XLA/Pallas re-design of the capabilities of
nihaomiao/CVPR23_LFDM (conditional image-to-video generation via
latent-flow diffusion), built TPU-first:

* NHWC / NDHWC layouts, bf16 matmul-friendly convs, fp32 norms.
* Frame loops folded into the batch axis (one XLA program, no host loops).
* Closed-form on-device 2x2 eigendecomposition instead of CPU SVD.
* `lax.scan`-compiled DDPM/DDIM samplers with in-graph dynamic thresholding.
* Mesh-based data parallelism (`jax.sharding` + shard_map) with
  cross-device batch-norm via `lax.pmean`, replacing thread-based
  DataParallel + SyncBN.
* Pallas kernels for the hot non-conv primitive (bilinear warp + occlusion
  blend fusion).

Two-stage pipeline (reference README.md:87-89):
  1. LFAE  - latent flow autoencoder (stage 1): region motion estimation,
     dense pixelwise flow + occlusion, warping generator.
  2. DM    - conditional 3D-UNet Gaussian diffusion over latent flow volumes
     `[B, F, h, w, 3]` (2 flow + 1 confidence channels).
"""

__version__ = "0.1.0"

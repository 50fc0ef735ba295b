"""damvsnet_tpu: a TPU-native multi-view stereo framework.

A ground-up JAX/XLA/Pallas/pjit implementation of the full capability surface
of DA-MVSNet (reference: wsmtht520/DAMVSNet): cascaded plane-sweep MVS depth
estimation with uncertainty-aware adaptive depth sampling (ADIA), adaptive
visibility-weighted cost-volume aggregation, geometry-aware reference-feature
fusion, optional FMT transformer features, cross-view photometric-consistency
training loss, dynamic geometric-consistency point-cloud fusion, and the DTU
evaluation protocol.

Layout:
  core/      cameras, PFM/PLY IO, pair files             (pure numpy, host)
  ops/       warp / cost volume / sampling / regression  (jnp + Pallas)
  nn/        flax modules (FPN, 3D U-Net, GeoFusion, FMT)
  model/     the cascade orchestrator
  losses/    staged smooth-L1 + CPC + entropy variants
  data/      DTU / BlendedMVS / TnT / generic loaders
  train/     pjit training loop, LR schedule, checkpointing, metrics
  parallel/  device mesh + sharding helpers
  infer/     depth runner + fusion backends (dypcd / pcd / consistency)
  eval/      DTU acc/comp (MATLAB-protocol-compatible, in Python)
  cli/       train / test / fuse / eval entry points
"""

__version__ = "0.1.0"

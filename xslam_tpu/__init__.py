"""xslam_tpu — a TPU-native differentiable dense SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of X-SLAM
("X-SLAM: Scalable Dense SLAM for Task-aware Optimization using CSFD",
SIGGRAPH 2024; reference C++/CUDA implementation mounted at
``/root/reference``): KinectFusion-style TSDF fusion + raycast + projective
point-to-plane ICP in which every quantity carries first- (CSFD) and
optionally second-order (DCSFD) directional derivatives.

Layers (reference layer in parentheses):

- :mod:`xslam_tpu.csfd`      — dual/hyper-dual number core (DeviceArray L2)
- :mod:`xslam_tpu.geometry`  — SE(3), intrinsics (Internal.h, se3Exp)
- :mod:`xslam_tpu.ops`       — device kernels: preprocess, fusion, raycast,
                               ICP, extraction (XKinectFusion L4 .cu files)
- :mod:`xslam_tpu.models`    — SLAM engines: KinectFusion pipeline, Newton
                               relocalizer (KinectFusionReconstruction L4)
- :mod:`xslam_tpu.parallel`  — multi-chip mesh sharding, halo exchange,
                               distributed pose solving (new; no reference
                               counterpart — reference is single-GPU)
- :mod:`xslam_tpu.io`        — datasets, synthetic scenes, PLY, YAML config
                               (Dataset.cpp, CPointCloud, L5 experiments)
- :mod:`xslam_tpu.utils`     — timing, checkpointing, evaluation (cxtimers)
"""

__version__ = "0.1.0"

"""panic3d_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of
PAniC-3D (ShuhongChen/panic3d-anime-reconstruction, CVPR 2023).

Layout (mirrors SURVEY.md §2 component inventory):
  ops/        compute kernels: upfirdn2d, bias_act, modulated conv, grid sample,
              pallas/ fused volumetric-render kernels
  cameras/    camera conventions, pose samplers, ray generation
  models/     StyleGAN2 backbone, triplane generator, superresolution,
              dual discriminator, volumetric renderer, aux models (rmline, resnet)
  data/       databackends + training datasets
  training/   losses, phase scheduler, training loop, stats
  parallel/   mesh construction + shardings (DP/ray-axis sharding over ICI)
  eval/       volume extraction, marching cubes, 2D/3D metrics, generate/measure
  runtime/    checkpointing (orbax + reference-pickle converter), profiling
  utils/      config dict, image helpers, sketchers
"""

__version__ = "0.1.0"

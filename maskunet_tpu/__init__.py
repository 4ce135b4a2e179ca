"""maskunet-tpu: a TPU-native segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MaskAttn-UNet
(reference: Belis0811/MaskUnet): a U-Net encoder-decoder with six masked
single-head attention blocks for universal low-resolution (128x128) semantic,
instance, and panoptic segmentation on ADE20K, COCO, and Cityscapes.

Layering (bottom-up):
  core/        functional NN layer library (pure init/apply), precision policy,
               train state, checkpointing, logging, early stopping
  ops/         TPU compute building blocks: Pallas blockwise masked attention,
               align-corners bilinear upsampling, jittable confusion/IoU
  models/      MaskAttnUNet as a pure function over a params/state pytree
  losses/      cross-entropy (+ignore_index), vectorized instance triplet loss
  parallel/    device mesh construction and sharding rules (DP over `data`)
  train/       jitted train/eval steps and the training loop
  data/        host-staged input pipelines (ADE20K / COCO / Cityscapes / synthetic)
  evaluation/  host-side metrics: RLE, COCO-style AP, PQ, connected components,
               DBSCAN instance decoding, mIoU
  tasks/       the 9 (dataset x task) recipes and train/evaluate glue
"""

__version__ = "0.1.0"

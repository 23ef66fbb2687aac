"""av1tpu — TPU-native framework for AV1 intra partition prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
chiarorosa/cnn-av1-research (pesquisa_v5 + pesquisa_v6): YUV ingestion,
hierarchical partition datasets, v5/v6/FGVC model families, stage trainers,
and a fused batched hierarchical inference graph, designed for TPU meshes.

Layer map (mirrors SURVEY.md §7):
    codec     pure partition-domain label maps
    ingest    YUV 4:2:0 10-bit reading, superblock tiling, encoder-dump parse
    data      dataset materialization, splits, samplers
    models    flax model families (v5 dsconv, v6 resnet18+SE+SA, FGVC, flatten)
    kernels   pallas TPU kernels for the hot paths
    train     losses, functional augmentation, schedules, stage trainers
    parallel  mesh / sharding rules (dp x model) over ICI
    eval      fused hierarchical inference, metrics, calibration, ensembles
    cli       entry points mirroring the reference 00x script surface
"""

__version__ = "0.1.0"

from av1tpu.models.layers import (  # noqa: F401
    AdapterModule,
    BasicBlock,
    ConvBNAct,
    DepthwiseSeparableConv,
    DualAttention,
    MLPHead,
    SEBlock,
    SpatialAttention,
    global_avg_pool,
)
from av1tpu.models.v5 import (  # noqa: F401
    HierarchicalBackbone,
    HierarchicalModel,
    HierarchicalOutputs,
    QPEmbedding,
)
from av1tpu.models.v6 import (  # noqa: F401
    FEATURE_DIM,
    ImprovedBackbone,
    Stage1Model,
    Stage2FlatModel,
    Stage2Model,
    Stage2ModelWithAdapters,
    Stage3ABModel,
    Stage3RectModel,
    UNIFIED_LOGIT_DIM,
    UNIFIED_LOGIT_SLICES,
    UnifiedV6Model,
    split_unified_logits,
)
from av1tpu.models.fgvc import (  # noqa: F401
    CosineClassifier,
    FGVCModel,
    center_loss,
    init_centers,
    l2_normalize,
)

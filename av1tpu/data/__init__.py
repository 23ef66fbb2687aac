from av1tpu.data.records import (  # noqa: F401
    NORM_10BIT,
    NORM_10BIT_DOUBLE,
    BlockSet,
    index_sequences,
    load_npz_sequences,
    load_reference_layout,
    load_torch_bundle,
    normalize_images,
    train_test_split,
)
from av1tpu.data.bundles import (  # noqa: F401
    Bundle,
    build_flatten_bundle,
    build_v5_bundle,
    build_v6_bundle,
    ensemble_shuffles,
    filter_partitioned_only,
    filter_stage2_v6,
    filter_stage3,
    oversample_ab,
    save_split,
)
from av1tpu.data.sampling import (  # noqa: F401
    balanced_epoch_indices,
    effective_number_weights,
    inverse_frequency_weights,
    oversample_indices,
    sample_weights_from_labels,
    shuffled_epoch_indices,
)

from av1tpu.train.losses import (  # noqa: F401
    binary_focal_loss,
    class_balanced_focal_loss,
    cutmix_batch,
    get_loss_function,
    hard_negative_mining_loss,
    masked_mean,
    mixed_loss,
    mixup_batch,
    multiclass_focal_loss,
    stage1_focal_bce_v5,
    weighted_ce_label_smoothing,
)
from av1tpu.train.augment import (  # noqa: F401
    batch_augment,
    batch_augment_labeled,
    get_augmentation,
    stage1_augment,
    stage2_augment,
    stage3_ab_augment,
    stage3_rect_augment,
    tta_views,
)
from av1tpu.train.schedules import (  # noqa: F401
    adamw,
    cosine_schedule,
    onecycle_schedule,
    partitioned_optimizer,
    ulmfit_phase1,
    ulmfit_phase2,
)
from av1tpu.train.trainer import (  # noqa: F401
    EpochResult,
    StepConfig,
    TrainState,
    confusion_matrix,
    confusion_to_metrics,
    make_eval_step,
    make_train_step,
    run_eval,
    run_train_epoch,
)
from av1tpu.train.checkpoint import (  # noqa: F401
    restore_checkpoint,
    save_checkpoint,
    transplant_backbone,
)
from av1tpu.parallel.mesh import make_mesh  # noqa: F401

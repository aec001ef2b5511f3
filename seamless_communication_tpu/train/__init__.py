from seamless_communication_tpu.train.loss import label_smoothed_nll_loss  # noqa: F401
from seamless_communication_tpu.train.lr import myle_lr  # noqa: F401
from seamless_communication_tpu.train.trainer import (  # noqa: F401
    FinetuneParams,
    FinetuneMode,
    make_train_step,
    UnitYFinetune,
)

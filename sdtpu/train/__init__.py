from sdtpu.train.step import (  # noqa: F401
    TrainState,
    init_train_state,
    jit_train_step,
    ldm_loss,
    make_optimizer,
    train_step,
)

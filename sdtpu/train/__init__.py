from sdtpu.train.step import (  # noqa: F401
    TrainState,
    init_train_state,
    jit_train_step,
    ldm_loss,
    load_train_state,
    make_optimizer,
    save_train_state,
    train_step,
)

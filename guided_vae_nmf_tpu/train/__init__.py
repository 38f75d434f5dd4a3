from .trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    make_eval_step,
    fit,
    train_m1,
    train_m2,
    train_classifier,
    train_wiener,
    m1_loss,
    m2_loss,
    classifier_loss,
    wiener_loss,
)
from .checkpoints import (
    checkpoint_name,
    save_params,
    load_params,
    best_checkpoint,
    save_resume_state,
    load_resume_state,
)

from grafp_tpu.train.loss import ntxent_loss
from grafp_tpu.train.state import TrainState, create_train_state, cosine_epoch_schedule
from grafp_tpu.train.step import make_train_step, make_embed_fn

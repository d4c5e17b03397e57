from wavedm_tpu.training.state import TrainState, create_train_state, make_optimizer
from wavedm_tpu.training.train_step import (
    make_train_step,
    prepare_wavelet_batch,
    prepare_pixel_batch,
)

from .schedule import lr_poly
from .state import TSNetTrainState, create_train_state
from .step import make_train_step

__all__ = ["lr_poly", "TSNetTrainState", "create_train_state",
           "make_train_step"]

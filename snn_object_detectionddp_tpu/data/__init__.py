from .dsec import DSECIndex, train_val_split  # noqa: F401
from .pipeline import BatchLoader, pad_labels  # noqa: F401

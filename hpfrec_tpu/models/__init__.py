from .hpf import HPF  # noqa: F401
from .state import Hyperparams, VariationalState, initialize_state  # noqa: F401

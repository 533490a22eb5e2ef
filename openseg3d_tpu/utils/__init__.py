from .logging import get_logger, get_root_logger
from .random import init_random_seed, set_random_seed
from .timer import Timer

__all__ = ['get_logger', 'get_root_logger', 'init_random_seed', 'set_random_seed', 'Timer']

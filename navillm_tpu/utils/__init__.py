from .config import ConfigDict, TrainArgs, load_yaml_config, read_args
from .logging_utils import create_logger
from .registry import Registry

"""min_llm_inference_tpu — a TPU-native continuous-batching greedy-decode
engine (JAX / XLA / Pallas / pjit) with the capabilities of the CUDA
reference xyg-coder/min_llm_inference, rebuilt TPU-first.

Public surface:
  config:   ModelConfig, EngineConfig
  models:   init_params, dense/paged backends
  runtime:  ItemStorage, Request, DenseEngine, PagedEngine
  metrics:  get_global_throughput_counter
"""

from .config import EngineConfig, ModelConfig
from .constants import (
    DEFAULT_INIT_NUM_BLOCKS,
    DEFAULT_PAGE_SIZE,
    EMPTY_ROW_TOKEN_ID,
    EOF_TOKEN_ID,
)
from .metrics import ThroughputCounter, get_global_throughput_counter
from .models.params import init_params
from .runtime.autonomous import AutonomousEngine, StreamingSession
from .runtime.engine import DenseEngine, NativePagedEngine, PagedEngine
from .runtime.item_storage import ItemStorage, ProcessingStorage, Request

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "ModelConfig",
    "EMPTY_ROW_TOKEN_ID",
    "EOF_TOKEN_ID",
    "DEFAULT_PAGE_SIZE",
    "DEFAULT_INIT_NUM_BLOCKS",
    "ThroughputCounter",
    "get_global_throughput_counter",
    "init_params",
    "AutonomousEngine",
    "StreamingSession",
    "DenseEngine",
    "NativePagedEngine",
    "PagedEngine",
    "ItemStorage",
    "ProcessingStorage",
    "Request",
]

"""Distributed transfer & coordination (reference: vllm_omni/distributed/).

Three planes, as in the reference (SURVEY.md §1 L2):
- control: ZMQ (coordinator.py)
- inter-stage data: connectors (connectors.py) + transfer manager
- intra-stage collectives: jax mesh axes (parallel/) — XLA, not NCCL
"""

from vllm_omni_tpu.distributed.connectors import (ConnectorBase,
                                                  ConnectorFactory,
                                                  InProcConnector,
                                                  SharedMemoryConnector)
from vllm_omni_tpu.distributed.transfer_manager import TransferManager

__all__ = [
    "ConnectorBase",
    "ConnectorFactory",
    "InProcConnector",
    "SharedMemoryConnector",
    "TransferManager",
]

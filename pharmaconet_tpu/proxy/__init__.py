"""Docking-proxy zoo: downstream heads on frozen PharmacoNet features.

TPU rebuild of /root/reference/src/pmnet_appl/ (proxy registry, TacoGFN and
SBDDReward proxies, target-cache protocol).
"""

from .base import BaseProxy, load_cache_keys
from .data import batch_graphs, mol_to_graph, smi2graph
from .proxies import SBDDReward_Proxy, TacoGFN_Proxy, get_docking_proxy

__all__ = [
    "BaseProxy",
    "load_cache_keys",
    "batch_graphs",
    "mol_to_graph",
    "smi2graph",
    "SBDDReward_Proxy",
    "TacoGFN_Proxy",
    "get_docking_proxy",
]

from categoricalnf_tpu.networks.causal_transformer import CausalTransformer
from categoricalnf_tpu.networks.lstm import CausalLSTM
from categoricalnf_tpu.networks.mlp import MLP
from categoricalnf_tpu.networks.transformer import SetTransformer

__all__ = ["CausalLSTM", "CausalTransformer", "MLP", "SetTransformer"]

from categoricalnf_tpu.flows.actnorm import ActNorm, ExtActNorm
from categoricalnf_tpu.flows.autoregressive import AutoregressiveMixtureCDF
from categoricalnf_tpu.flows.base import Transform, apply_mask, sum_ldj
from categoricalnf_tpu.flows.coupling import (MixtureCDFCoupling,
                                              make_channel_mask,
                                              make_checker_mask)
from categoricalnf_tpu.flows.distributions import (GaussianPrior,
                                                   HMMPrior,
                                                   LogisticPrior,
                                                   create_prior)
from categoricalnf_tpu.flows.linear import InvertibleLinear, ReverseChannels
from categoricalnf_tpu.flows.model import FlowModel
from categoricalnf_tpu.flows.sigmoid import Logit, Sigmoid
from categoricalnf_tpu.flows.scanned import ScannedBlocks
from categoricalnf_tpu.flows.softclamp import SoftClamp

__all__ = [
    "Transform", "apply_mask", "sum_ldj", "ActNorm", "ExtActNorm",
    "AutoregressiveMixtureCDF", "MixtureCDFCoupling", "make_channel_mask",
    "make_checker_mask", "GaussianPrior", "HMMPrior", "LogisticPrior",
    "create_prior",
    "InvertibleLinear", "ReverseChannels", "FlowModel", "Logit", "Sigmoid",
    "SoftClamp", "ScannedBlocks",
]

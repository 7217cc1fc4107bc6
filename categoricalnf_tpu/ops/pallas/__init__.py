from categoricalnf_tpu.ops.pallas.mixture import (mixture_forward_pallas,
                                                  mixture_inverse_pallas)

__all__ = ["mixture_forward_pallas", "mixture_inverse_pallas"]

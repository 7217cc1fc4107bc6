from categoricalnf_tpu.models.categorical_flow import CategoricalFlow

__all__ = ["CategoricalFlow"]

"""categoricalnf_tpu — a TPU-native framework for Categorical Normalizing Flows.

Built from scratch in JAX/XLA/Pallas (reference: phlippe/CategoricalNF,
paper arXiv:2006.09790).  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

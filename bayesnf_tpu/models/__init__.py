"""Model layer: field configuration, feature encoders, likelihoods, priors."""

from bayesnf_tpu.models.field import FieldConfig
from bayesnf_tpu.models.field import apply_field
from bayesnf_tpu.models.field import init_params
from bayesnf_tpu.models.field import param_specs
from bayesnf_tpu.models.likelihoods import LikelihoodDist

__all__ = [
    'FieldConfig',
    'apply_field',
    'init_params',
    'param_specs',
    'LikelihoodDist',
]

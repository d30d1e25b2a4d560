from . import host
from .field_jax import FQ, FR, FieldSpec
from .limbs import DIGIT_BITS, N_DIGITS, digits_to_int, int_to_digits

__all__ = [
    "host",
    "FieldSpec",
    "FR",
    "FQ",
    "DIGIT_BITS",
    "N_DIGITS",
    "int_to_digits",
    "digits_to_int",
]

"""Polynomial layer: host-tier sparse/univariate forms + device-tier MLE.

Maps the reference's polynomial/ crate (SURVEY.md §1 L2):
  univariate  — dense coefficient univariate (host, verifier-side)
  coeff_mle   — sparse coefficient-form multilinear (host, test vectors)
  hypercube   — boolean hypercube iterator (host)
  mle         — dense evaluation-form multilinear (device, THE hot type)
  product     — ProductPoly / SumOfProducts (device, sumcheck input)
"""

from zk_tpu.poly.coeff_mle import CoeffMultilinearPolynomial  # noqa: F401
from zk_tpu.poly.hypercube import BooleanHyperCube  # noqa: F401
from zk_tpu.poly.mle import MLE  # noqa: F401
from zk_tpu.poly.product import ProductPoly, SumOfProducts  # noqa: F401
from zk_tpu.poly.univariate import UnivariatePolynomial  # noqa: F401

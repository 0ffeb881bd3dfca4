"""Robust cost weight functions (IRLS weights), vectorized.

reference: include/lama/nlls/robust_cost.h:42-76, src/nlls/robust_cost.cpp:36-83.
Each returns w(x) such that the IRLS solver scales residual rows by sqrt(w)
(src/nlls/solver.cpp:69-77).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RobustCost:
    """Static spec; ``weight(x)`` evaluates elementwise on arrays."""

    kind: str = "unit"      # unit | cauchy | tukey | tstudent | huber
    param: float = 1.0

    def weight(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.kind == "unit":
            return jnp.ones_like(x)
        if self.kind == "cauchy":
            # w = 1 / (1 + x^2 / c^2)   (robust_cost.cpp:66-73)
            c = 1.0 / (self.param * self.param)
            return 1.0 / (1.0 + x * x * c)
        if self.kind == "tukey":
            # w = (1 - x^2/b^2)^2 for |x| <= b else 0  (robust_cost.cpp:41-54)
            bb = self.param * self.param
            t = 1.0 - (x * x) / bb
            return jnp.where(x * x <= bb, t * t, 0.0)
        if self.kind == "tstudent":
            # w = (dof + 1) / (dof + x^2)  (robust_cost.cpp:56-63)
            return (self.param + 1.0) / (self.param + x * x)
        if self.kind == "huber":
            # w = 1 if x < k else k/|x|  (robust_cost.cpp:75-83)
            k = self.param
            ax = jnp.abs(x)
            return jnp.where(x < k, 1.0, k / jnp.maximum(ax, 1e-30))
        raise ValueError(f"unknown robust cost: {self.kind}")


UNIT = RobustCost("unit")
# Tukey's default b (robust_cost.h:52)
TUKEY_DEFAULT = RobustCost("tukey", 4.685)
# The scan matchers hardwire Cauchy(0.15) (src/slam2d.cpp:106, loc2d.cpp:70)
CAUCHY_SCAN = RobustCost("cauchy", 0.15)

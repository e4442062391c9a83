"""Frontend eDSL: typed wires over a global circuit builder.

Mirrors reference crates/plonk/src/frontend/mod.rs: a process-global
Frontend holds the CircuitSpec under construction; Call binds values via a
TraceBuilder and produces the (fp, fq) trace pair.
"""

from __future__ import annotations

from ..curves import CurveCfg
from ..plonk.circuit import CircuitSpec, TraceBuilder
from ..plonk.trace import trace_pair


class Frontend:
    def __init__(self):
        self.circuit = CircuitSpec()


_CURRENT = Frontend()


def current() -> Frontend:
    return _CURRENT


def reset() -> None:
    global _CURRENT
    _CURRENT = Frontend()


class Call:
    """Binds witness/public-input values and produces the trace pair."""

    def __init__(self):
        import copy

        self.trace_builder = TraceBuilder(copy.deepcopy(current().circuit))

    def witness(self, ws, value: int) -> None:
        self.trace_builder.witness(ws.wire, value)

    def witness_bool(self, wb, b: bool) -> None:
        self.trace_builder.witness(wb.wire, 1 if b else 0)

    def witness_affine(self, wp, affine) -> None:
        # affine: host (x, y) tuple or None for identity -> (0,0)
        x, y = (0, 0) if affine is None else affine
        self.trace_builder.witness(wp.x.wire, x)
        self.trace_builder.witness(wp.y.wire, y)

    def public_input(self, ws, value: int) -> None:
        self.trace_builder.public_input(ws.wire, value)

    def public_input_affine(self, wp, affine) -> None:
        x, y = (0, 0) if affine is None else affine
        self.trace_builder.public_input(wp.x.wire, x)
        self.trace_builder.public_input(wp.y.wire, y)

    def trace(self, accs_prev=None, static_circuits=None):
        return trace_pair(self.trace_builder, accs_prev, static_circuits)


from . import primitives  # noqa: E402,F401
from .primitives import WireAffine, WireBool, WireScalar  # noqa: E402,F401

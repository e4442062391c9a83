"""Structured error taxonomy (SURVEY §5 failure detection).

The reference propagates anyhow::Result with ensure!/bail! everywhere
(pcdl.rs:547-550, acc.rs:207-210, trace_builder.rs:120-132); verification
failure is an Err.  Here every failure mode gets a typed exception so
callers can distinguish proof rejection from misuse from internal bugs.
"""

from __future__ import annotations


class HaloError(Exception):
    """Base class for all halo_tpu errors."""


class VerificationError(HaloError, ValueError):
    """A proof/accumulator/signature failed verification (the protocol-level
    'reject' outcome — not a bug).  Subclasses ValueError for backward
    compatibility with callers catching the old untyped errors."""


class PcdlCheckError(VerificationError):
    """pcdl succinct_check/check equation failed (pcdl.rs:547-550)."""


class AccumulationError(VerificationError):
    """Accumulation verifier mismatch: C/z/d/h(z) (acc.rs:207-210)."""


class PlonkVerifyError(VerificationError):
    """PLONK verify_succinct failed: f(xi) != t(xi)*z_H(xi) or transcript
    mismatch (protocol.rs:441-444)."""


class WitnessError(HaloError):
    """Arithmetizer misuse: unassigned/doubly-assigned wires, wrong wire
    kind, unsatisfiable circuit (trace_builder.rs:120-132)."""


class SerdeError(HaloError):
    """Malformed bytes in the ark-serialize codec (non-canonical field
    element, off-curve point, trailing bytes)."""

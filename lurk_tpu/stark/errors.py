"""Verification-path error type.

Proof-shape violations raise VerificationError instead of assert (asserts
are stripped under python -O) and are converted to a False verdict at the
machine.verify / pcs.verify_rounds boundary (ADVICE.md round-1 low finding).
"""


class VerificationError(Exception):
    pass

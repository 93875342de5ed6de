"""LogUp lookup argument: permutation traces + constraints.

Implements the protocol sketched by the reference's (disabled) first-party
logup module and realized inside sphinx (reference: src/logup/, SURVEY.md
section 2.3): every interaction contributes mult/fingerprint to a running
sum; the global sum over all chips/shards is zero iff the send and receive
multisets match.

Fingerprint of a tuple v: d = r + sum_j gamma^(j+1) * v_j (extension field).
Interactions are batched in pairs per permutation column:
  phi_b = m_1/d_1 + m_2/d_2          (constraint: phi*d1*d2 = m1*d2 + m2*d1)
with a final running-sum column S:
  first row:   S = sum_b phi_b
  transition:  S_next = S + sum_b phi_b(next)
  last row:    S = cumulative_sum (public, summed to zero by the verifier)

Sends count positive, receives negative.
"""

from .trace import (build_permutation_trace, interaction_batches,
                    perm_trace_width)
from .constraints import eval_perm_quotient_np, eval_perm_at_point

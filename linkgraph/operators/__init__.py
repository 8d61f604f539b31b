"""Core dataflow operators (reference: ``gunrock::operators::*``).

The reference composes every algorithm from five frontier operators
(SURVEY.md §2.1, [ref: include/gunrock/framework/operators/operators.hxx —
UNVERIFIED]).  We keep the same public decomposition so new primitives are
operator compositions (reference entry point EP3, SURVEY.md §3.1), but each
operator is a declarative DataFrame transform that Catalyst plans — the
load-balancing variants of the reference collapse into Spark's shuffle +
AQE + the salting helpers here.
"""

from linkgraph.operators.advance import advance
from linkgraph.operators.filter import filter_frontier
from linkgraph.operators.parallel_for import parallel_for
from linkgraph.operators.neighbor_reduce import neighbor_reduce, salted_agg
from linkgraph.operators.uniquify import uniquify

__all__ = [
    "advance",
    "filter_frontier",
    "parallel_for",
    "neighbor_reduce",
    "salted_agg",
    "uniquify",
]

"""Algorithm primitives (reference: ``include/gunrock/algorithms/*.hxx``).

Each primitive is a composition of the operators in
:mod:`linkgraph.operators` driven by the superstep runtime
(:mod:`linkgraph.superstep`) — mirroring the reference's
problem + enactor + operator decomposition (SURVEY.md §2.3, §3.1).
"""

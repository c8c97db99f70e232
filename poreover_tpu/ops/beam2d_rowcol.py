"""row_col (symmetric) 2D beam search traversal.

Equivalent of beam_search_2d_by_row_col (reference BeamSearch.h:262-397),
the default traversal for pair-decode. Lands on top of the by-row sweep
engine in beam2d.py; until then pair-decode can use method="row".
"""
from __future__ import annotations


def beam_search_2d_row_col(y1, y2, envelope, beam_width, alphabet, model):
    raise NotImplementedError(
        "row_col 2D traversal not yet implemented; use method='row'"
    )

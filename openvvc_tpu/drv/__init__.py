"""Derivation-layer modules (MV prediction, merge lists, HMVP, TMVP)."""

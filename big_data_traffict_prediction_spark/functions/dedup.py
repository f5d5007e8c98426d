"""Stub — populated in this round."""

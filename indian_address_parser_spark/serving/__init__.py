"""Single-node REST serving surface (S8) — see serving/api.py."""

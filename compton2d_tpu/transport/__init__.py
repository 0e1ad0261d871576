"""Photon transport: geometry, sourcing, tracking, scattering, leakage."""

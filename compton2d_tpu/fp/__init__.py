"""Fokker-Planck electron evolution: Chang-Cooper solve + zone update."""

"""Samplers: Metropolis-Hastings core + adaptation / tempering / SMC layers."""

"""Model state: Gaussian parameter pytrees, optimizer, density control."""

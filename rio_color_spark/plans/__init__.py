"""Logical-plan layer: the ops DSL parser and fused-chain compiler."""

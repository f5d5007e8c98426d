"""Plan introspection helpers: pushdown/broadcast/codegen audits."""

"""News-model parity corpus — populated next (stg/transformed/marts)."""

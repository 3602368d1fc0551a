from .checkpoint import (
    add_part_id,
    run_checkpointed,
    load_lineage,
    part_id_for_key,
)

__all__ = ["add_part_id", "run_checkpointed", "load_lineage", "part_id_for_key"]

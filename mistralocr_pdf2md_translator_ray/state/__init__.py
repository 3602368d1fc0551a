from .checkpoint import (
    add_part_id,
    run_checkpointed,
    run_checkpointed_append,
    load_lineage,
    part_id_for_key,
)

__all__ = ["add_part_id", "run_checkpointed", "run_checkpointed_append",
           "load_lineage", "part_id_for_key"]

"""Parallelism: (data, model) mesh + TP PartitionSpec rules, GPipe pipeline
stage, multi-host init."""

from .mesh import data_sharded, make_mesh, replicated
from .pipeline import (make_train_step_pp, pipeline_param_specs,
                       pipeline_stack_forward)
from .sharding import shard_params, talker_param_specs

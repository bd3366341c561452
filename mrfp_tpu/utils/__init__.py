from mrfp_tpu.utils.meters import AverageMeter
from mrfp_tpu.utils.experiment import (enable_persistent_compile_cache,
                                       enable_stack_dumps, make_exp_name,
                                       prep_experiment, save_log)
from mrfp_tpu.utils.profiling import step_timer, trace_ctx

__all__ = ["AverageMeter", "enable_persistent_compile_cache",
           "enable_stack_dumps", "make_exp_name", "prep_experiment",
           "save_log", "step_timer", "trace_ctx"]

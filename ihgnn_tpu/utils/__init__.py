from ihgnn_tpu.utils.logging import TeeLogger, log_print, start_logging, end_logging

__all__ = ["TeeLogger", "log_print", "start_logging", "end_logging"]

"""Logging setup (reference ``detectron2/utils/logger.py:34-199``).

``setup_logger`` gives color console output on the main process and per-rank
``log.txt.rank{N}`` files; ``log_first_n``/``log_every_n``/``log_every_n_seconds``
rate-limit chatty call sites.
"""

import functools
import logging
import os
import sys
import time
from collections import Counter
from typing import Optional


class _ColorfulFormatter(logging.Formatter):
    GREY = "\x1b[38;20m"
    YELLOW = "\x1b[33;20m"
    RED = "\x1b[31;20m"
    RESET = "\x1b[0m"

    def format(self, record):
        log = super().format(record)
        if record.levelno == logging.WARNING:
            return self.YELLOW + "WARNING" + self.RESET + " " + log
        if record.levelno in (logging.ERROR, logging.CRITICAL):
            return self.RED + "ERROR" + self.RESET + " " + log
        return log


@functools.lru_cache()
def setup_logger(
    output: Optional[str] = None,
    distributed_rank: int = 0,
    *,
    color: bool = True,
    name: str = "detectron2_centernet_tpu",
    abbrev_name: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if abbrev_name is None:
        abbrev_name = "d2tpu" if name == "detectron2_centernet_tpu" else name

    plain_formatter = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        if color and sys.stdout.isatty():
            ch.setFormatter(
                _ColorfulFormatter(
                    "[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"
                )
            )
        else:
            ch.setFormatter(plain_formatter)
        logger.addHandler(ch)

    if output is not None:
        filename = output if output.endswith((".txt", ".log")) else os.path.join(output, "log.txt")
        if distributed_rank > 0:
            filename = filename + f".rank{distributed_rank}"
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(plain_formatter)
        logger.addHandler(fh)

    return logger


_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


def _find_caller():
    frame = sys._getframe(2)
    while frame:
        code = frame.f_code
        if os.path.join("utils", "logger.") not in code.co_filename:
            mod_name = frame.f_globals["__name__"]
            if mod_name == "__main__":
                mod_name = "detectron2_centernet_tpu"
            return mod_name, (code.co_filename, frame.f_lineno, code.co_name)
        frame = frame.f_back


def log_first_n(lvl: int, msg: str, n: int = 1, *, name: Optional[str] = None, key="caller") -> None:
    if isinstance(key, str):
        key = (key,)
    caller_module, caller_key = _find_caller()
    hash_key = ()
    if "caller" in key:
        hash_key = hash_key + caller_key
    if "message" in key:
        hash_key = hash_key + (msg,)
    _LOG_COUNTER[hash_key] += 1
    if _LOG_COUNTER[hash_key] <= n:
        logging.getLogger(name or caller_module).log(lvl, msg)


def log_every_n(lvl: int, msg: str, n: int = 1, *, name: Optional[str] = None) -> None:
    caller_module, key = _find_caller()
    _LOG_COUNTER[key] += 1
    if n == 1 or _LOG_COUNTER[key] % n == 1:
        logging.getLogger(name or caller_module).log(lvl, msg)


def log_every_n_seconds(lvl: int, msg: str, n: int = 1, *, name: Optional[str] = None) -> None:
    caller_module, key = _find_caller()
    last_logged = _LOG_TIMER.get(key)
    current_time = time.time()
    if last_logged is None or current_time - last_logged >= n:
        logging.getLogger(name or caller_module).log(lvl, msg)
        _LOG_TIMER[key] = current_time

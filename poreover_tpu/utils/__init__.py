from .logspace import LOG_0, LOG_1, logaddexp, logsumexp
from .fasta import fasta_format, write_fasta

__all__ = [
    "LOG_0",
    "LOG_1",
    "logaddexp",
    "logsumexp",
    "fasta_format",
    "write_fasta",
]

from .analytics import ANALYTICS_JOBS
from .corpus import CORPUS_JOBS
from .domain import DOMAIN_JOBS

__all__ = ["DOMAIN_JOBS", "ANALYTICS_JOBS", "CORPUS_JOBS"]

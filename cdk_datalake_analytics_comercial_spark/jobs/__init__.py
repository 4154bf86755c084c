from .domain import DOMAIN_JOBS

__all__ = ["DOMAIN_JOBS"]

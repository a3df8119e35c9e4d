from .seen import BloomFilter, SeenShard, SeenSet  # noqa: F401
from .frontier import FrontierShard, Frontier  # noqa: F401

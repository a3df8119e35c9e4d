from .fetch import FetchReplay, fetch_replay_batch  # noqa: F401
from .extract_stage import ExtractStage, extract_batch  # noqa: F401

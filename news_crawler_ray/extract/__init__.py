from .kernel import ExtractKernel, PageExtract  # noqa: F401

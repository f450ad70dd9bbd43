from . import exact, engagement, text, datetime_utils  # noqa: F401

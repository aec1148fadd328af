from .transcripts import (  # noqa: F401
    TRANSCRIPT_FIELDS,
    mongo_changelog,
    mysql_changelog,
    transcripts,
)

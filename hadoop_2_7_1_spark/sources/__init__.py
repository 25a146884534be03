"""Source/sink operators beyond the core loaders in :mod:`..io`.

SURVEY.md §2.1 coverage map:

- ``FixedLengthInputFormat`` (MRC/mapreduce/lib/input/FixedLengthInputFormat.java:50,
  FixedLengthRecordReader.java) → :mod:`.fixedlen`
- ``SequenceFileInputFilter`` regex / percent / MD5 filters
  (MRC/mapreduce/lib/input/SequenceFileInputFilter.java:110,153,202) → :mod:`.filters`
- ``StreamXmlRecordReader`` (ST/StreamXmlRecordReader.java) → :mod:`.xml`
- ``DBInputFormat`` / ``DataDrivenDBInputFormat`` / ``DBOutputFormat``
  (MRC/mapreduce/lib/db/DBInputFormat.java:61, DBOutputFormat.java:50) → :mod:`.jdbc`
- ``DistCp`` / ``HadoopArchives`` (hadoop-tools) → :mod:`.tools`
"""

from . import filters, fixedlen, jdbc, tools, xml  # noqa: F401

"""CSArc-compatible multithreaded archiver (csarc a/x/l/t).

Format parity with /root/reference/src/archiver: 24-byte header, per-task
CSC streams appended as archive blocks, CSC-compressed index trailer.
"""

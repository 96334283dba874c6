"""qoipp_tpu.parallel"""

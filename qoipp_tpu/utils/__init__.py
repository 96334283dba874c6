"""qoipp_tpu.utils"""

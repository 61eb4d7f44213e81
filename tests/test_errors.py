"""Error taxonomy: every reference variant name exists and the precise
names subclass their broader category so callers can match either
granularity (reference: src/lib.rs:59-311)."""

import flac_codec_tpu.errors as E

REFERENCE_VARIANTS = [
    "AccumulatorOverflow", "BitsPerSampleMismatch", "BlockSizeMismatch",
    "ChannelCountMismatch", "ChannelLengthMismatch", "ChannelsMismatch",
    "Crc16Mismatch", "Crc8Mismatch", "ExcessiveBlockSize", "ExcessiveBps",
    "ExcessiveChannels", "ExcessiveFrameNumber", "ExcessivePictureSize",
    "ExcessiveStringLength", "ExcessiveTotalSamples",
    "ExcessiveVorbisEntries", "ExcessiveWastedBits",
    "InsufficientApplicationBlock", "InsufficientLpcSamples",
    "InvalidBitsPerSample", "InvalidBlockSize", "InvalidChannels",
    "InvalidCodingMethod", "InvalidFixedOrder", "InvalidFrameNumber",
    "InvalidLpcOrder", "InvalidMetadataBlock", "InvalidMetadataBlockSize",
    "InvalidPartitionOrder", "InvalidPictureType", "InvalidQlpPrecision",
    "InvalidSampleRate", "InvalidSeek", "InvalidSeekTablePoint",
    "InvalidSeekTableSize", "InvalidSubframeHeader",
    "InvalidSubframeHeaderType", "InvalidSyncCode", "InvalidTotalBytes",
    "InvalidTotalSamples", "MissingFlacTag", "MissingResiduals",
    "MissingStreaminfo", "MultipleGeneralIcon", "MultiplePngIcon",
    "MultipleSeekTable", "MultipleStreaminfo", "MultipleVorbisComment",
    "NegativeLpcShift", "NoBestLpcOrder", "NoSamples",
    "NonSubsetBitsPerSample", "NonSubsetSampleRate", "ReservedMetadataBlock",
    "ResidualOverflow", "SampleCountMismatch", "SampleRateMismatch",
    "SamplesNotDivisibleByChannels", "ShortBlock", "TooManySamples",
    "ZeroLpCoefficients", "LpNegativeShiftError",
]

LAYERING = {
    "ExcessiveBlockSize": "InvalidBlockSize",
    "ExcessiveBps": "InvalidBitsPerSample",
    "ExcessiveChannels": "InvalidChannels",
    "ChannelCountMismatch": "ChannelsMismatch",
    "ChannelLengthMismatch": "ChannelsMismatch",
    "ExcessivePictureSize": "InvalidPicture",
    "InvalidPictureType": "InvalidPicture",
    "ExcessiveStringLength": "InvalidVorbisComment",
    "ExcessiveVorbisEntries": "InvalidVorbisComment",
    "InsufficientApplicationBlock": "InvalidMetadata",
    "InvalidMetadataBlock": "InvalidMetadata",
    "InvalidMetadataBlockSize": "InvalidMetadata",
    "ReservedMetadataBlock": "InvalidMetadata",
    "InvalidSeekTablePoint": "InvalidSeekTable",
    "InvalidSeekTableSize": "InvalidSeekTable",
    "InvalidSubframeHeaderType": "InvalidSubframeHeader",
    "InvalidTotalSamples": "ExcessiveTotalSamples",
    "TooManySamples": "ExcessiveTotalSamples",
    "MultiplePngIcon": "DuplicateIcon",
    "MultipleGeneralIcon": "DuplicateIcon",
    "NonSubsetSampleRate": "InvalidSampleRate",
    "NonSubsetBitsPerSample": "InvalidBitsPerSample",
}


def test_all_reference_variants_exist():
    for name in REFERENCE_VARIANTS:
        cls = getattr(E, name)
        assert issubclass(cls, E.FlacError), name


def test_precise_variants_layer_on_broad_classes():
    for sub, parent in LAYERING.items():
        assert issubclass(getattr(E, sub), getattr(E, parent)), (sub, parent)

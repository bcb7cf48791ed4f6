"""Sources & sinks: synthetic page corpus, file readers, checkpointed table IO."""

"""Sources: change-event log readers (batch + streaming) and the packed
binary row decoder."""
